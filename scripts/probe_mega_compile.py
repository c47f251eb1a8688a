#!/usr/bin/env python
"""Compile-only probe of the mega transport-simplex kernel at growing
sizes: reports Mosaic compile success/failure and time per size, without
running the warm-start pipeline.  Usage: python scripts/probe_mega_compile.py [sizes...]
"""
from __future__ import annotations

import sys
import time

import numpy as np


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
    import jax.numpy as jnp

    from smart_crossover_tpu.ops.transport_simplex_mega import (
        batched_transport_simplex_mega,
    )

    sizes = [int(a) for a in sys.argv[1:]] or [256, 512, 784]
    B = 2
    print(f"backend={jax.default_backend()}")
    for n in sizes:
        X = jnp.zeros((B, n, n), jnp.float32)
        Bm = jnp.zeros((B, n, n), bool)
        M = jnp.zeros((B, n, n), jnp.float32)
        t0 = time.perf_counter()
        try:
            lowered = jax.jit(
                lambda X_, Bm_, M_: batched_transport_simplex_mega(
                    X_, Bm_, M_, max_pivots=100)).lower(X, Bm, M)
            lowered.compile()
            print(f"  {n}x{n}: compile OK "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"  {n}x{n}: FAIL ({time.perf_counter() - t0:.1f}s) {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
