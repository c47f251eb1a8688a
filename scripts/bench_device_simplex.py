"""Head-to-head: device transportation simplex engines + host core.

Times the fully-device-resident exact OT crossover
(parallel/batched.py::batched_tnet_exact_device) with the parent-array
engine vs the mask-propagation engine, and the host-native cleanup path
(batched_tnet_exact), at growing instance sizes.  Run on whatever
jax.default_backend() is (TPU through the relay by default).

Usage: python scripts/bench_device_simplex.py [sizes...]  (default 64 128 256)
"""
from __future__ import annotations

import sys
import time

import numpy as np


def make_batch(B, S, D, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    s = rng.uniform(0.5, 2.0, (B, S)).astype(dtype)
    d = rng.uniform(0.5, 2.0, (B, D)).astype(dtype)
    d *= (s.sum(axis=1) / d.sum(axis=1))[:, None]
    def grid(N):
        side = int(np.sqrt(N))
        while N % side:      # largest divisor <= sqrt(N)
            side -= 1
        return np.stack(np.unravel_index(np.arange(N), (side, N // side)),
                        -1)

    xs = grid(S)
    xd = grid(D)
    M0 = np.abs(xs[:, None, :] - xd[None, :, :]).sum(-1).astype(dtype)
    M = M0[None] + rng.uniform(0, 0.1, (B, S, D)).astype(dtype)
    return s, d, M


def main():
    import jax

    import os
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from smart_crossover_tpu.parallel.batched import (
        batched_tnet_exact,
        batched_tnet_exact_device,
    )

    B = 16
    engines = ("mega", "packed", "anc", "parent", "mask")
    sizes = []
    skip_host = False
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            B = int(a.split("=", 1)[1])
        elif a.startswith("--engines="):
            engines = tuple(a.split("=", 1)[1].split(","))
        elif a == "--no-host":
            skip_host = True
        else:
            sizes.append(int(a))
    sizes = sizes or [64, 128, 256]
    backend = jax.default_backend()
    print(f"backend={backend} batch={B}")
    for n in sizes:
        s, d, M = make_batch(B, n, n)
        row = {"n": n, "B": B}
        for engine in engines:
            if engine == "mask" and n > 128:
                row["mask"] = None  # known-slow; skip (STATUS.md #1)
                continue
            if engine == "parent" and n > 512:
                row["parent"] = None  # quadratic wall (VERDICT r2 weak 2)
                continue
            if engine == "mega" and n > 784:
                row["mega"] = None  # faults the TPU worker at 1024^2 (r5)
                continue
            fn = lambda: batched_tnet_exact_device(
                s, d, M, reg=0.005, sinkhorn_iters=1000,
                max_pivots=20000, engine=engine)
            out = fn()
            # fetch-forced warmup: through the relay, block_until_ready
            # can return EARLY on the first re-dispatch of a cached
            # executable (measured: 'block' 0.2 ms while the real compute
            # took 3.3 s and was paid at fetch) — force a host fetch once,
            # then use MEDIAN of blocked reps, never min
            float(np.asarray(out[1]).sum())
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = fn()
                jax.block_until_ready(out)
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            X, obj, push, piv, opt, _ = out
            row[engine] = {
                "s": round(dt, 4),
                "inst_per_s": round(B / dt, 1),
                "max_pivots": int(np.max(np.asarray(piv))),
                "all_optimal": bool(np.all(np.asarray(opt))),
            }
        if skip_host:
            print(row, flush=True)
            continue
        # host-native cleanup path (threaded C++ core)
        t0 = time.perf_counter()
        hX, hobj, hpiv, hopt = batched_tnet_exact(
            s, d, M, reg=0.005, sinkhorn_iters=1000)
        host_dt = time.perf_counter() - t0
        row["host"] = {"s": round(host_dt, 4),
                       "inst_per_s": round(B / host_dt, 1),
                       "all_optimal": bool(np.all(hopt))}
        if row.get("parent"):
            dev_obj = np.asarray(obj, dtype=np.float64)
            gap = np.max(np.abs(dev_obj - hobj) / (np.abs(hobj) + 1))
            row["obj_gap_device_vs_host"] = float(gap)
        print(row, flush=True)


if __name__ == "__main__":
    main()
