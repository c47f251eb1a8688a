"""Measure the VMEM-resident PDHG chunk kernel vs the XLA scan on-device.

Isolates exactly the iteration chunk both paths run inside
``_pdhg_core.outer_body``: 64 adaptive PDHG iterations over a dense A.
The XLA path streams A from HBM twice per iteration; the Pallas kernel
reads it once per chunk.  min-of-reps timing (relay dispatch is noisy).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(m=512, n=2048, chunk=64, reps=30):
    from smart_crossover_tpu.config import interpret_pallas
    from smart_crossover_tpu.ops.pdhg_pallas import get_pdhg_chunk_fn

    backend = jax.default_backend()
    dt = jnp.float32
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((m, n)), dt)
    b = jnp.asarray(rng.standard_normal(m), dt)
    c = jnp.asarray(rng.standard_normal(n), dt)
    l = jnp.zeros(n, dt)
    u = jnp.ones(n, dt)
    eq = jnp.ones(m, dtype=bool)
    x = jnp.full(n, 0.5, dt)
    y = jnp.zeros(m, dt)
    Ax = A @ x
    xs = jnp.zeros(n, dt)
    ys = jnp.zeros(m, dt)
    opnorm = jnp.asarray(80.0, dt)
    wsum = jnp.asarray(0.0, dt)
    eta = jnp.asarray(0.9, dt) / opnorm
    omega = jnp.asarray(1.0, dt)

    # --- XLA scan chunk (the _pdhg_core.one_iter math) ------------------
    def one_iter(carry, _):
        x, y, Ax, xs, ys, wsum, eta, omega, k = carry
        tau = eta / omega
        sigma = eta * omega
        x_c = jnp.clip(x - tau * (c - A.T @ y), l, u)
        Ax_c = A @ x_c
        y_t = y + sigma * (b - (2.0 * Ax_c - Ax))
        y_c = jnp.where(eq, y_t, jnp.minimum(y_t, 0.0))
        dx = x_c - x
        dy = y_c - y
        curv = jnp.abs(dy @ (Ax_c - Ax))
        nz = omega * (dx @ dx) + (dy @ dy) / omega
        eta_bar = jnp.where(curv > 0, nz / (2.0 * curv), 1e10 / opnorm)
        accept = eta <= eta_bar
        k1 = (k + 1).astype(dt)
        eta_next = jnp.minimum((1.0 - k1 ** -0.3) * eta_bar,
                               (1.0 + k1 ** -0.6) * eta)
        eta_next = jnp.clip(eta_next, 1e-10 / opnorm, 1e10 / opnorm)
        x = jnp.where(accept, x_c, x)
        y = jnp.where(accept, y_c, y)
        Ax = jnp.where(accept, Ax_c, Ax)
        w = jnp.where(accept, eta, 0.0)
        return (x, y, Ax, xs + w * x, ys + w * y, wsum + w,
                eta_next, omega, k + 1), None

    # MANY chunks inside one jit: per-call relay dispatch here is ~30 ms,
    # so a single-chunk call would time the relay, not the chip
    K = 32   # 32 * chunk iterations per dispatch

    @jax.jit
    def xla_run(x, y, Ax, xs, ys, wsum, eta):
        def outer(_, s):
            (x, y, Ax, xs, ys, wsum, eta) = s
            (x, y, Ax, xs, ys, wsum, eta, _, _), _ = jax.lax.scan(
                one_iter, (x, y, Ax, xs, ys, wsum, eta, omega, 0),
                None, length=chunk)
            return (x, y, Ax, xs, ys, wsum, eta)

        return jax.lax.fori_loop(0, K, outer, (x, y, Ax, xs, ys, wsum, eta))

    runner = get_pdhg_chunk_fn(m, n, "float32", chunk, interpret_pallas())

    @jax.jit
    def pls_run(x, y, Ax, xs, ys, wsum, eta):
        def outer(_, s):
            (x, y, Ax, xs, ys, wsum, eta) = s
            return runner(A, b, c, l, u, eq, x, y, Ax, xs, ys,
                          wsum, eta, omega, 0, opnorm)

        return jax.lax.fori_loop(0, K, outer, (x, y, Ax, xs, ys, wsum, eta))

    def timeit(f):
        out = f(x, y, Ax, xs, ys, wsum, eta)
        # fetch-forced warmup (relay: block can return early on the first
        # re-dispatch of a cached executable); median, never min
        float(np.asarray(out[0]).sum())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x, y, Ax, xs, ys, wsum, eta))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), out

    t_xla, o_xla = timeit(xla_run)
    t_pls, o_pls = timeit(pls_run)
    iters = K * chunk
    print(json.dumps({
        "metric": "pdhg_chunk_us_per_iter",
        "backend": backend, "m": m, "n": n, "chunk": chunk,
        "iters_per_dispatch": iters,
        "xla_us_per_iter": round(t_xla / iters * 1e6, 2),
        "pallas_us_per_iter": round(t_pls / iters * 1e6, 2),
        "speedup": round(t_xla / t_pls, 3),
    }))


if __name__ == "__main__":
    import sys

    args = [int(a) for a in sys.argv[1:]]
    main(*args)
