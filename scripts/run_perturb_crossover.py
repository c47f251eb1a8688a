#!/usr/bin/env python
"""Perturbation-crossover experiment driver.

Protocol parity with the reference driver
(reference scripts/run_perturb_crossover.py:44-97): for every LP instance,
run

* ``ori`` — the in-house barrier + crossover (the vendor-baseline analog);
* ``ptb`` — the perturbation crossover (run_perturb_algorithm);

with resume support (already-recorded instances are skipped, like the
reference's find_solved_problems) and the same tolerances
(BARRIER_TOL=1e-10 pinned as the default, matching the reference protocol
at reference scripts/run_perturb_crossover.py:56; configurable).

Instances come either from a directory of .mps/.lp files (the reference's
presolved optLP set) or from ``--generate optlp``, which builds the
reference-scale synthetic suite (three structure families, ~30k rows /
~1e5 cols each; data/lp_gen.py) — this environment has no download path.
``--oracle`` additionally solves each instance with scipy HiGHS and
records the reference objective for the exactness column.
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from smart_crossover_tpu.analysis import compare, summarize, table
from smart_crossover_tpu.data import ResultStore, load_instance
from smart_crossover_tpu.lp_methods.algorithms import run_perturb_algorithm
from smart_crossover_tpu.solvers.settings import SolverSettings
from smart_crossover_tpu.solvers.solving import solve_lp


def _highs_objective(lp, time_limit=3600.0):
    from scipy.optimize import linprog

    eq = lp.sense == "="
    bounds = [(li if np.isfinite(li) else None,
               ui if np.isfinite(ui) else None)
              for li, ui in zip(lp.l, lp.u)]
    t0 = time.perf_counter()
    res = linprog(lp.c, A_ub=lp.A[~eq], b_ub=lp.b[~eq],
                  A_eq=lp.A[eq], b_eq=lp.b[eq], bounds=bounds,
                  method="highs", options={"time_limit": time_limit})
    return (res.fun if res.status == 0 else None,
            time.perf_counter() - t0, int(res.status))


def run_suite(instances, store: ResultStore, barrier_tol: float,
              optimality_tol: float, oracle: bool = False,
              oracle_time_limit: float = 3600.0,
              time_limit: float = 3600.0):
    """instances: iterable of (name, thunk) where thunk() -> GeneralLP."""
    for name, thunk in instances:
        lp = None
        if oracle and not store.is_solved(name, "highs"):
            lp = thunk()
            obj, rt, st = _highs_objective(lp, oracle_time_limit)
            store.record(name, "highs", status="OPTIMAL" if st == 0
                         else f"HIGHS_{st}", runtime=rt, obj_val=obj)
            print(f"  {name} highs: obj={obj} ({rt:.1f}s)")
        if not store.is_solved(name, "ptb"):
            if lp is None:
                lp = thunk()
            out = run_perturb_algorithm(lp, barrierTol=barrier_tol,
                                        optimalityTol=optimality_tol)
            store.record(name, "ptb", status=out.status, runtime=out.runtime,
                         obj_val=out.obj_val, iter_count=out.iter_count,
                         bar_iter_count=out.bar_iter_count)
            print(f"  {name} ptb: {out.status} obj={out.obj_val} "
                  f"pivots={out.iter_count} ({out.runtime})")
        if not store.is_solved(name, "ori"):
            if lp is None:
                lp = thunk()
            # the baseline gets the full time budget: the default
            # 200k pivot cap binds FIRST on hard instances (mcom hit it at
            # ~1900 s), which would under-report the vendor-analog baseline
            out = solve_lp(lp, method="barrier",
                           settings=SolverSettings(barrierTol=barrier_tol,
                                                   crossover="on",
                                                   timeLimit=time_limit,
                                                   simplexMaxIters=10_000_000))
            store.record(name, "ori", status=out.status, runtime=out.runtime,
                         obj_val=out.obj_val, iter_count=out.iter_count,
                         bar_iter_count=out.bar_iter_count)
            print(f"  {name} ori: {out.status} obj={out.obj_val} "
                  f"pivots={out.iter_count} ({out.runtime})")


def main(data_dir: str = "data/lp", results: str = "results/perturb.jsonl",
         barrier_tol: float = 1e-10, optimality_tol: float = 1e-6,
         max_instances: int | None = None, generate: str | None = None,
         scale: float = 1.0, num_per_family: int = 4,
         oracle: bool = False, oracle_time_limit: float = 3600.0,
         reverse: bool = False, time_limit: float = 3600.0,
         families: str | None = None):
    store = ResultStore(results)
    if generate == "optlp":
        from smart_crossover_tpu.data.lp_gen import optlp_scale_suite

        fams = tuple(families.split(",")) if families else (
            "stair", "cover", "mcom", "rail", "tran")
        lps = optlp_scale_suite(num_per_family=num_per_family,
                                scale=scale, families=fams)
        # cheap families first (staircase/multicommodity ori finish in
        # minutes; cover's cold crossover can take ~1h each) so partial
        # runs maximise instance coverage.  --reverse runs the list
        # back-to-front: a second worker sharing the (re-read-per-check)
        # ResultStore then works the expensive tail while the first
        # works the cheap head, meeting in the middle.
        lps.sort(key=lambda lp: (lp.name.startswith("cover"), lp.name),
                 reverse=reverse)
        if max_instances:
            lps = lps[:max_instances]
        instances = [(lp.name, (lambda _lp=lp: _lp)) for lp in lps]
        print(f"{len(instances)} generated optLP-scale instances "
              f"(scale={scale})")
    else:
        paths = sorted(Path(data_dir).glob("*.mps")) \
            + sorted(Path(data_dir).glob("*.mps.gz")) \
            + sorted(Path(data_dir).glob("*.lp")) \
            + sorted(Path(data_dir).glob("*.lp.gz"))
        if max_instances:
            paths = paths[:max_instances]
        instances = [(p.stem, (lambda _p=p: load_instance(_p)))
                     for p in paths]
        print(f"{len(instances)} LP instances in {data_dir}")

    run_suite(instances, store, barrier_tol, optimality_tol,
              oracle=oracle, oracle_time_limit=oracle_time_limit,
              time_limit=time_limit)

    print()
    print(table(summarize(store)))
    cmp = compare(store, ours="ptb", baseline="ori")
    print(f"\nptb vs ori: {cmp}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="data/lp")
    ap.add_argument("--results", default="results/perturb.jsonl")
    ap.add_argument("--barrier-tol", type=float, default=1e-10)
    ap.add_argument("--optimality-tol", type=float, default=1e-6)
    ap.add_argument("--max-instances", type=int, default=None)
    ap.add_argument("--generate", choices=["optlp"], default=None,
                    help="generate the optLP-scale synthetic suite "
                         "instead of reading --data-dir")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--num-per-family", type=int, default=4)
    ap.add_argument("--oracle", action="store_true",
                    help="record scipy-HiGHS objectives per instance")
    ap.add_argument("--oracle-time-limit", type=float, default=3600.0)
    ap.add_argument("--reverse", action="store_true",
                    help="process instances in reverse order (second "
                         "worker sharing the same result store)")
    ap.add_argument("--time-limit", type=float, default=3600.0,
                    help="per-arm wall budget for the ori baseline "
                         "(reference protocol: 3600 s; bounded runs "
                         "disclose the budget in the table)")
    ap.add_argument("--families", default=None,
                    help="comma-separated family subset (stair,cover,"
                         "mcom,rail,tran) — lets parallel workers "
                         "partition the suite deterministically")
    a = ap.parse_args()
    main(a.data_dir, a.results, a.barrier_tol, a.optimality_tol,
         a.max_instances, a.generate, a.scale, a.num_per_family,
         a.oracle, a.oracle_time_limit, a.reverse, a.time_limit,
         a.families)
