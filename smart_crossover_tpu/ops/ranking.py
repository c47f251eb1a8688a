"""Flow-indicator ranking kernels.

The network crossover ranks arcs by how "important" the interior-point flow on
them is, relative to the throughput of their endpoint nodes, then feeds the
sorted queue to column generation.  The reference computes this with scipy
sparse matrix products and a per-column sparse max
(reference net_manager.py:156-184 for MCF, :368-379 for OT).  Here the same
quantities are computed with JAX segment ops over arc arrays (MCF) and dense
broadcasting (OT), which vectorise onto the VPU and `vmap` over instance
batches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mcf_flow_indicators(x, tails, heads, u, num_nodes: int):
    """Per-arc flow indicators for a min-cost-flow solution.

    Semantics match reference net_manager.py:156-184:

    1. Arcs carrying more than half their capacity are *reversed*
       (``x_hat = u - x`` there), out-of-bound flows are clamped to 0.
    2. Per-node throughput ``f = max(inflow, outflow)`` of ``x_hat`` over the
       (reversed) graph.
    3. ``indicator_j = x_hat_j * max(1/f_tail(j), 1/f_head(j))`` (0 where the
       endpoint throughput is 0).

    Args:
        x: (n,) interior-point flow.
        tails, heads: (n,) int arc endpoints.
        u: (n,) capacities (may be +inf).
        num_nodes: number of nodes m.

    Returns:
        (n,) float indicators.
    """
    x = jnp.asarray(x)
    reverse = x > u / 2  # never True for u == +inf
    x_hat = jnp.where(reverse, u - x, x)
    x_hat = jnp.where((x < 0) | (x > u), 0.0, x_hat)
    eff_tails = jnp.where(reverse, heads, tails)
    eff_heads = jnp.where(reverse, tails, heads)

    inflow = jax.ops.segment_sum(x_hat, eff_heads, num_segments=num_nodes)
    outflow = jax.ops.segment_sum(x_hat, eff_tails, num_segments=num_nodes)
    f = jnp.maximum(inflow, outflow)
    f_inv = jnp.where(f != 0, 1.0 / jnp.where(f != 0, f, 1.0), 0.0)

    return x_hat * jnp.maximum(f_inv[eff_tails], f_inv[eff_heads])


def ot_flow_indicators(X, s, d):
    """Flow indicators for an OT plan: ``max(X/s_i, X/d_j)`` elementwise.

    Matches reference net_manager.py:368-379. ``X`` is the (ns, nd) plan.
    """
    X = jnp.asarray(X)
    return jnp.maximum(X / s[:, None], X / d[None, :])


def sort_flows(indicators):
    """Sorted arc queue, largest indicator first (reference uses
    ``argsort()[::-1]``; ties resolved deterministically by index here)."""
    flat = jnp.asarray(indicators).reshape(-1)
    return jnp.argsort(-flat, stable=True)
