"""Separate fixed relay dispatch overhead from per-iteration device cost.

Times the same fused single-jit Sinkhorn loop at several iteration
counts; a linear fit gives the per-iteration device cost (slope) and the
fixed per-dispatch cost (intercept).  Per CLAUDE.md: fetch-forced
warmup, median of blocked reps.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_relay_overhead.py
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    B, S, D = 64, 256, 256
    rng = np.random.default_rng(0)
    s = rng.uniform(0.5, 2.0, (B, S)).astype(np.float32)
    d = rng.uniform(0.5, 2.0, (B, D)).astype(np.float32)
    d *= (s.sum(1) / d.sum(1))[:, None]
    M = rng.uniform(0.0, 1.0, (B, S, D)).astype(np.float32)

    @partial(jax.jit, static_argnums=(3,))
    def sink(s, d, M, iters):
        K = jnp.exp(-M / 0.05)

        def body(_, uv):
            u, v = uv
            u = s / (K @ v[..., None])[..., 0]
            v = d / (jnp.swapaxes(K, 1, 2) @ u[..., None])[..., 0]
            return (u, v)

        u = jnp.ones_like(s)
        v = jnp.ones_like(d)
        u, v = jax.lax.fori_loop(0, iters, body, (u, v))
        return u[:, :, None] * K * v[:, None, :]

    rows = []
    for iters in (50, 200, 800):
        out = sink(s, d, M, iters)
        float(np.asarray(out).sum())       # fetch-forced warmup
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            out = sink(s, d, M, iters)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        rows.append((iters, med, sorted(ts)))
        print(f"iters={iters:5d}  median={med*1e3:9.2f} ms  "
              f"all={[round(t*1e3,1) for t in sorted(ts)]}")

    (i1, t1, _), (i2, t2, _) = rows[0], rows[-1]
    slope = (t2 - t1) / (i2 - i1)
    intercept = t1 - slope * i1
    print(f"per-iter device cost: {slope*1e6:.1f} us/iter "
          f"({slope*1e3*200:.1f} ms per 200 iters)")
    print(f"fixed per-dispatch overhead: {intercept*1e3:.1f} ms")
    # analytic bytes per iter: K streamed twice (two matvecs)
    bytes_per_iter = 2 * B * S * D * 4
    print(f"effective HBM BW on the matvec stream: "
          f"{bytes_per_iter / slope / 1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
