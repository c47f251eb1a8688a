"""Command-line interface:  python -m smart_crossover_tpu <command> ...

The reference has no CLI (hardcoded script mains); this is a convenience
front door over the same facade the scripts use.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="smart_crossover_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_solve = sub.add_parser("solve", help="solve an instance file")
    p_solve.add_argument("path",
                         help=".mps/.mps.gz/.lp/.lp.gz/.min/.ot/.mcf instance")
    p_solve.add_argument("--method", default="default",
                         help="default|barrier|barrier_perturb|simplex|"
                              "primal_simplex|dual_simplex|network_simplex|"
                              "first_order")
    p_solve.add_argument("--barrier-tol", type=float, default=1e-8)
    p_solve.add_argument("--crossover", default="on", choices=["on", "off"])

    p_x = sub.add_parser("crossover", help="crossover an instance from a "
                                           "first-order warm start")
    p_x.add_argument("path")
    p_x.add_argument("--algo", default="auto",
                     help="tnet|cnet_ot|cnet_mcf|perturb|auto")

    p_bench = sub.add_parser("bench", help="run the throughput benchmark")

    args = ap.parse_args(argv)

    if args.cmd == "bench":
        import runpy
        from pathlib import Path

        runpy.run_path(str(Path(__file__).resolve().parents[1] / "bench.py"),
                       run_name="__main__")
        return 0

    from smart_crossover_tpu.data.loaders import load_instance
    from smart_crossover_tpu.models import GeneralLP, MinCostFlow, OptTransport
    from smart_crossover_tpu.solvers.settings import SolverSettings

    inst = load_instance(args.path)

    if args.cmd == "solve":
        from smart_crossover_tpu.solvers.solving import (
            solve_lp,
            solve_mcf,
            solve_ot,
        )

        settings = SolverSettings(barrierTol=args.barrier_tol,
                                  crossover=args.crossover)
        if isinstance(inst, OptTransport):
            out = solve_ot(inst, method=args.method, settings=settings)
        elif isinstance(inst, MinCostFlow):
            out = solve_mcf(inst, method=args.method, settings=settings)
        else:
            out = solve_lp(inst, method=args.method, settings=settings)
        print(out)
        return 0 if out.status == "OPTIMAL" else 1

    # crossover command
    algo = args.algo
    if algo == "auto":
        algo = ("tnet" if isinstance(inst, OptTransport)
                else "cnet_mcf" if isinstance(inst, MinCostFlow)
                else "perturb")
    if algo == "perturb":
        from smart_crossover_tpu.lp_methods.algorithms import (
            run_perturb_algorithm,
        )

        out = run_perturb_algorithm(inst)
    else:
        import numpy as np

        from smart_crossover_tpu.network_methods import network_crossover

        if isinstance(inst, OptTransport):
            from smart_crossover_tpu.solvers.sinkhorn import sinkhorn

            x = sinkhorn(inst, reg=0.01, num_iters=1000)
            out = network_crossover(x=x, ot=inst, method=algo)
        else:
            from smart_crossover_tpu.solvers.solving import solve_mcf

            fo = solve_mcf(inst, method="first_order",
                           settings=SolverSettings(crossover="off",
                                                   firstOrderMaxIters=20_000))
            out = network_crossover(x=np.clip(fo.x, 0, None), mcf=inst,
                                    method=algo)
    print(out)
    return 0 if out.status == "OPTIMAL" else 1


if __name__ == "__main__":
    sys.exit(main())
