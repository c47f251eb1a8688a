#!/usr/bin/env python
"""Perturbation-crossover experiment driver.

Protocol parity with the reference driver
(reference scripts/run_perturb_crossover.py:44-97): for every ``.mps`` LP in
the data directory, run

* ``ori`` — the in-house barrier + crossover (the vendor-baseline analog);
* ``ptb`` — the perturbation crossover (run_perturb_algorithm);

with resume support (already-recorded instances are skipped, like the
reference's find_solved_problems) and the same tolerances
(BARRIER_TOL=1e-10 pinned as the default, matching the reference protocol
at reference scripts/run_perturb_crossover.py:56; configurable).
"""
from __future__ import annotations

import argparse
from pathlib import Path

from smart_crossover_tpu.analysis import compare, summarize, table
from smart_crossover_tpu.data import ResultStore, load_instance
from smart_crossover_tpu.lp_methods.algorithms import run_perturb_algorithm
from smart_crossover_tpu.solvers.settings import SolverSettings
from smart_crossover_tpu.solvers.solving import solve_lp


def main(data_dir: str = "data/lp", results: str = "results/perturb.jsonl",
         barrier_tol: float = 1e-10, optimality_tol: float = 1e-6,
         max_instances: int | None = None):
    store = ResultStore(results)
    paths = sorted(Path(data_dir).glob("*.mps")) \
        + sorted(Path(data_dir).glob("*.mps.gz")) \
        + sorted(Path(data_dir).glob("*.lp")) \
        + sorted(Path(data_dir).glob("*.lp.gz"))
    if max_instances:
        paths = paths[:max_instances]
    print(f"{len(paths)} LP instances in {data_dir}")

    for p in paths:
        name = p.stem
        lp = None
        if not store.is_solved(name, "ori"):
            lp = load_instance(p)
            out = solve_lp(lp, method="barrier",
                           settings=SolverSettings(barrierTol=barrier_tol,
                                                   crossover="on"))
            store.record(name, "ori", status=out.status, runtime=out.runtime,
                         obj_val=out.obj_val, iter_count=out.iter_count,
                         bar_iter_count=out.bar_iter_count)
            print(f"  {name} ori: {out.status} obj={out.obj_val}")
        if not store.is_solved(name, "ptb"):
            if lp is None:
                lp = load_instance(p)
            out = run_perturb_algorithm(lp, barrierTol=barrier_tol,
                                        optimalityTol=optimality_tol)
            store.record(name, "ptb", status=out.status, runtime=out.runtime,
                         obj_val=out.obj_val, iter_count=out.iter_count,
                         bar_iter_count=out.bar_iter_count)
            print(f"  {name} ptb: {out.status} obj={out.obj_val}")

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
    a = ap.parse_args()
    main(a.data_dir, a.results, a.barrier_tol, a.optimality_tol,
         a.max_instances)
