#!/usr/bin/env python
"""Probe: does the TPU (through the relay) support f64 GEMM/Cholesky,
and at what speed?  Decides whether ipm_big's exact endgame iterations
(the f32-preconditioner-dead zone) can ride the device instead of the
host BLAS (scripts/bench_ipm_big.py telemetry: ~21 s/exact iteration at
5000x15000 on the host).

Usage: JAX_ENABLE_X64=1 python scripts/probe_tpu_f64.py [m n]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    args = [int(a) for a in sys.argv[1:]]
    m, n = args if len(args) == 2 else (2000, 6000)
    backend = jax.default_backend()
    print(f"backend={backend} x64={jax.config.jax_enable_x64} {m}x{n}",
          flush=True)
    rng = np.random.default_rng(0)
    A = rng.standard_normal((m, n))
    d = rng.uniform(0.5, 2.0, n)

    @jax.jit
    def ne(A_, d_):
        M = jnp.matmul(A_ * d_[None, :], A_.T,
                       precision=jax.lax.Precision.HIGHEST)
        return M + m * jnp.eye(m, dtype=M.dtype)

    @jax.jit
    def chol(M_):
        return jnp.linalg.cholesky(M_)

    try:
        A_dev = jax.device_put(A)
        d_dev = jax.device_put(d)
        print("dtype on device:", A_dev.dtype, flush=True)
        M = ne(A_dev, d_dev)
        ref = float(np.asarray(M)[0, 0])   # forced fetch
        exp = float(((A[0] * d) @ A[0]) + m)
        print(f"gemm ok, M[0,0]={ref:.12e} vs host {exp:.12e} "
              f"(rel {abs(ref - exp) / abs(exp):.2e})", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            M = ne(A_dev, d_dev)
            jax.block_until_ready(M)
            ts.append(time.perf_counter() - t0)
        gf = 2 * m * m * n / 1e9
        t_med = float(np.median(ts))
        print(f"f64 NE gemm: {t_med:.3f}s median -> {gf / t_med:.1f} GFLOPS",
              flush=True)
        L = chol(M)
        lv = float(np.asarray(L)[0, 0])
        print(f"chol ok, L[0,0]={lv:.6e}", flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            L = chol(M)
            jax.block_until_ready(L)
            ts.append(time.perf_counter() - t0)
        print(f"f64 cholesky({m}): {float(np.median(ts)):.3f}s median",
              flush=True)
    except Exception as e:
        print(f"F64 UNSUPPORTED OR FAILED: {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
