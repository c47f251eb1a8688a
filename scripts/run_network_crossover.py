#!/usr/bin/env python
"""Network-crossover experiment driver.

Protocol parity with the reference driver (reference
scripts/run_network_crossover.py:51-133):

* ``test_object='crossover'`` — per instance, obtain an interior solution
  (in-house barrier, crossover off), then time TNET/CNET from that x_bar and
  compare against the in-house barrier-with-crossover baseline.
* ``test_object='total'`` — end-to-end: Sinkhorn warm start + TNET/CNET vs. a
  cold network-simplex baseline.

Instances: synthetic MNIST-like OT pairs (data/ot_gen.py), DIMACS ``.min``
MCF files, or ``.mps`` network LPs in ``--data-dir``.  Results stream to a
resumable JSON-lines ResultStore; re-running skips solved instances.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from smart_crossover_tpu.analysis import summarize, table
from smart_crossover_tpu.data import (
    ResultStore,
    mnist_like_ot_suite,
    read_dimacs_min,
)
from smart_crossover_tpu.models import MinCostFlow, OptTransport
from smart_crossover_tpu.network_methods import network_crossover
from smart_crossover_tpu.solvers.settings import SolverSettings
from smart_crossover_tpu.solvers.sinkhorn import sinkhorn
from smart_crossover_tpu.solvers.solving import solve_mcf, solve_ot


def load_instances(problem: str, data_dir: Path, num_pairs: int):
    if problem == "ot":
        suite = mnist_like_ot_suite(num_pairs=num_pairs)
        return [(ot.name, ot) for ot in suite]
    insts = []
    for p in sorted(data_dir.glob("*.min")):
        insts.append((p.stem, read_dimacs_min(p)))
    for p in sorted(data_dir.glob("*.mps")):
        from smart_crossover_tpu.data import read_mps

        lp = read_mps(p)
        try:
            mcf = MinCostFlow.from_incidence(lp.get_standard_A(), lp.b,
                                             lp.get_standard_c(),
                                             lp.u, name=p.stem)
            insts.append((p.stem, mcf))
        except ValueError:
            print(f"skipping {p.stem}: not a network LP")
    return insts


def run_instance(name, inst, methods, store, settings, barrier_tol):
    if isinstance(inst, OptTransport):
        barrier = solve_ot(inst, method="barrier",
                           settings=SolverSettings(barrierTol=barrier_tol,
                                                   crossover="on"))
    else:
        barrier = solve_mcf(inst, method="barrier",
                            settings=SolverSettings(barrierTol=barrier_tol,
                                                    crossover="on"))
    if barrier.status != "OPTIMAL":
        store.record(name, "barrier", status=barrier.status,
                     runtime=barrier.runtime)
        return
    # baseline record: barrier + its own crossover
    store.record(name, "barrier_crossover", status=barrier.status,
                 runtime=barrier.runtime, obj_val=barrier.obj_val,
                 iter_count=barrier.iter_count,
                 bar_iter_count=barrier.bar_iter_count)
    x_bar = barrier.x_bar

    for method in methods:
        if store.is_solved(name, method):
            continue
        kwargs = ({"ot": inst} if isinstance(inst, OptTransport)
                  else {"mcf": inst})
        if isinstance(inst, MinCostFlow) and method != "cnet_mcf":
            continue
        if isinstance(inst, OptTransport) and method == "cnet_mcf":
            continue
        out = network_crossover(x=x_bar, method=method,
                                solver_settings=settings, **kwargs)
        gap = (abs(out.obj_val - barrier.obj_val)
               / (abs(out.obj_val) + abs(barrier.obj_val) + 1))
        store.record(name, method, status=out.status, runtime=out.runtime,
                     obj_val=out.obj_val, iter_count=out.iter_count,
                     rel_gap_vs_barrier=gap)
        print(f"  {name} {method}: {out.status} obj={out.obj_val:.6g} "
              f"iters={out.iter_count} rt={out.runtime.total_seconds():.3f}s")


def run_total(name, inst, methods, store, settings):
    """End-to-end mode: first-order warm start + crossover vs cold network
    simplex (Sinkhorn for OT, matrix-free PDHG for MCF)."""
    if isinstance(inst, OptTransport):
        cold = solve_ot(inst, method="network_simplex")
    else:
        cold = solve_mcf(inst, method="network_simplex")
    store.record(name, "cold_network_simplex", status=cold.status,
                 runtime=cold.runtime, obj_val=cold.obj_val,
                 iter_count=cold.iter_count)
    if isinstance(inst, OptTransport):
        x = sinkhorn(inst, reg=0.01, num_iters=1000)
        run_methods = [m for m in methods if m != "cnet_mcf"]
        kwargs = {"ot": inst}
    else:
        fo = solve_mcf(inst, method="first_order",
                       settings=SolverSettings(crossover="off",
                                               firstOrderMaxIters=20_000))
        import numpy as _np

        x = _np.clip(fo.x, 0, None)
        run_methods = ["cnet_mcf"]
        kwargs = {"mcf": inst}
    for method in run_methods:
        out = network_crossover(x=x, method=method,
                                solver_settings=settings, **kwargs)
        store.record(name, f"total_{method}", status=out.status,
                     runtime=out.runtime, obj_val=out.obj_val,
                     iter_count=out.iter_count)
        print(f"  {name} total_{method}: {out.status} "
              f"obj={out.obj_val:.6g} iters={out.iter_count}")


def main(problem: str = "ot", test_object: str = "crossover",
         barrier_tol: float = 1e-4, num_pairs: int = 10,
         data_dir: str = "data", results: str = "results/network.jsonl",
         pricing: str = "SE"):
    store = ResultStore(results)
    settings = SolverSettings(log_console=0, simplexPricing=pricing)
    methods = ["tnet", "cnet_ot", "cnet_mcf"]
    instances = load_instances(problem, Path(data_dir), num_pairs)
    print(f"{len(instances)} instances ({problem}, {test_object})")
    for name, inst in instances:
        if test_object == "crossover":
            run_instance(name, inst, methods, store, settings, barrier_tol)
        else:
            run_total(name, inst, methods, store, settings)
    print()
    print(table(summarize(store)))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="ot", choices=["ot", "mcf"])
    ap.add_argument("--test-object", default="crossover",
                    choices=["crossover", "total"])
    ap.add_argument("--barrier-tol", type=float, default=1e-4)
    ap.add_argument("--num-pairs", type=int, default=10)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--results", default="results/network.jsonl")
    ap.add_argument("--pricing", default="SE", choices=["SE", "PP"])
    a = ap.parse_args()
    main(a.problem, a.test_object, a.barrier_tol, a.num_pairs, a.data_dir,
         a.results, a.pricing)
