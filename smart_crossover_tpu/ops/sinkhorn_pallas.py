"""Pallas TPU kernel: fused batched Sinkhorn.

The XLA implementation of Sinkhorn (solvers/sinkhorn.py) streams the cost
tensor from HBM twice per iteration (row + column logsumexp).  This kernel
pins a BLOCK of instances' cost matrices in VMEM for the whole iteration
count — one HBM read total — and vectorises across the instances in the
block so the VPU stays saturated (TPU grid programs run sequentially, so
one-instance-per-program would starve it).

Block size is chosen from the VMEM budget; shapes should be lane-aligned
(S multiple of 8, D multiple of 128 for f32).  Callers use
``pallas_shapes_ok`` to gate and fall back to the XLA path otherwise.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smart_crossover_tpu.config import interpret_pallas


def _sinkhorn_kernel(s_ref, d_ref, M_ref, out_ref, *, reg, num_iters):
    M = M_ref[...]                    # (BB, S, D) resident in VMEM
    log_s = jnp.log(s_ref[:, 0, :])   # (BB, S)
    log_d = jnp.log(d_ref[:, 0, :])   # (BB, D)
    inv_reg = 1.0 / reg

    def body(_, fg):
        f, g = fg
        t = (g[:, None, :] - M) * inv_reg          # (BB, S, D)
        tmax = jnp.max(t, axis=2)
        f = reg * (log_s - (tmax + jnp.log(
            jnp.sum(jnp.exp(t - tmax[:, :, None]), axis=2))))
        t2 = (f[:, :, None] - M) * inv_reg
        t2max = jnp.max(t2, axis=1)
        g = reg * (log_d - (t2max + jnp.log(
            jnp.sum(jnp.exp(t2 - t2max[:, None, :]), axis=1))))
        return f, g

    f0 = jnp.zeros_like(log_s)
    g0 = jnp.zeros_like(log_d)
    f, g = jax.lax.fori_loop(0, num_iters, body, (f0, g0))
    out_ref[...] = jnp.exp((f[:, :, None] + g[:, None, :] - M) * inv_reg)


def _pick_block(B: int, S: int, D: int, itemsize: int) -> int:
    """Largest power-of-two instance block fitting ~8 MB of VMEM working
    set (M block + t intermediate)."""
    budget = 8 * 1024 * 1024
    bb = 1
    while bb * 2 <= B and B % (bb * 2) == 0 \
            and 3 * (bb * 2) * S * D * itemsize <= budget:
        bb *= 2
    return bb


@partial(jax.jit, static_argnames=("reg", "num_iters", "interpret",
                                   "block_b"))
def sinkhorn_plan_pallas(s, d, M, reg: float, num_iters: int = 200,
                         interpret: bool | None = None,
                         block_b: int | None = None):
    """Batched Sinkhorn plans via the fused Pallas kernel.

    Args:
        s: (B, S) supplies, d: (B, D) demands, M: (B, S, D) costs.
        reg: absolute entropic regularisation (static).
        block_b: instances per grid program (default: auto from VMEM budget).

    Returns:
        (B, S, D) transport plans (unrounded).
    """
    if interpret is None:
        interpret = interpret_pallas()
    B, S, D = M.shape
    if block_b is None:
        block_b = _pick_block(B, S, D, jnp.dtype(M.dtype).itemsize)
    # lift vectors to (B, 1, N): the (1, N) trailing block dims satisfy the
    # TPU tiling rule (second-to-last == array dim, last % 128 or == dim)
    s3 = jnp.reshape(s, (B, 1, S))
    d3 = jnp.reshape(d, (B, 1, D))
    kernel = partial(_sinkhorn_kernel, reg=float(reg), num_iters=num_iters)
    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, S, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, S, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, D), M.dtype),
        interpret=interpret,
    )(s3, d3, M)


def pallas_shapes_ok(S: int, D: int, dtype=jnp.float32) -> bool:
    """Lane-alignment + VMEM-budget check for the fused kernel."""
    itemsize = jnp.dtype(dtype).itemsize
    vmem_bytes = 3 * S * D * itemsize + 8 * (S + D) * itemsize
    return (S % 8 == 0 and D % 128 == 0 and vmem_bytes < 8 * 1024 * 1024)
