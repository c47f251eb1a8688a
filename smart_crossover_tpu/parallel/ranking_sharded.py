"""Mesh-sharded MCF flow ranking.

For a single huge min-cost-flow instance, the arc arrays are sharded across
the mesh 'model' axis; per-node throughput is a segment-sum over local arcs
followed by one psum of the (replicated-size) node vector, after which the
per-arc indicators are embarrassingly local.  This is the multi-chip form of
ops/ranking.py::mcf_flow_indicators, the CNET column-ranking hot spot
(reference net_manager.py:156-184).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from smart_crossover_tpu.parallel.mesh import MODEL_AXIS


def sharded_mcf_flow_indicators(mesh, x, tails, heads, u, num_nodes: int):
    """Compute per-arc flow indicators with arcs sharded over 'model'.

    Args:
        x, tails, heads, u: (n,) arc arrays; n must divide by the mesh width.
        num_nodes: m (node vectors are replicated — they are small compared
            to the arc arrays that dominate memory).

    Returns:
        (n,) indicators, sharded over the mesh.
    """
    vec = NamedSharding(mesh, P(MODEL_AXIS))
    x = jax.device_put(jnp.asarray(x), vec)
    tails = jax.device_put(jnp.asarray(tails, jnp.int32), vec)
    heads = jax.device_put(jnp.asarray(heads, jnp.int32), vec)
    u = jax.device_put(jnp.asarray(u, x.dtype), vec)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(MODEL_AXIS),) * 4, out_specs=P(MODEL_AXIS),
             check_vma=False)
    def _rank(x_loc, t_loc, h_loc, u_loc):
        reverse = x_loc > u_loc / 2
        x_hat = jnp.where(reverse, u_loc - x_loc, x_loc)
        x_hat = jnp.where((x_loc < 0) | (x_loc > u_loc), 0.0, x_hat)
        eff_t = jnp.where(reverse, h_loc, t_loc)
        eff_h = jnp.where(reverse, t_loc, h_loc)
        inflow = jax.ops.segment_sum(x_hat, eff_h, num_segments=num_nodes)
        outflow = jax.ops.segment_sum(x_hat, eff_t, num_segments=num_nodes)
        inflow = jax.lax.psum(inflow, MODEL_AXIS)
        outflow = jax.lax.psum(outflow, MODEL_AXIS)
        f = jnp.maximum(inflow, outflow)
        f_inv = jnp.where(f != 0, 1.0 / jnp.where(f != 0, f, 1.0), 0.0)
        return x_hat * jnp.maximum(f_inv[eff_t], f_inv[eff_h])

    return jax.jit(_rank)(x, tails, heads, u)


def sharded_sorted_flows(mesh, x, tails, heads, u, num_nodes: int
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Full ranking: sharded indicators, then a host argsort of the gathered
    indicator vector (the queue feeds host-side column generation anyway)."""
    ind = np.asarray(sharded_mcf_flow_indicators(
        mesh, x, tails, heads, u, num_nodes), dtype=np.float64)
    queue = np.argsort(-ind, kind="stable")
    return queue, ind
