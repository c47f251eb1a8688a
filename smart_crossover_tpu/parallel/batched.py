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


def tnet_single(s, d, M, reg: float = 0.02, sinkhorn_iters: int = 200,
                tree_weights: str = "flow"):
    """One-instance TNET pipeline (jittable): Sinkhorn -> indicators ->
    MST -> tree solve -> push.  Returns (X_vertex, push_iters, obj).

    ``tree_weights='reduced_cost'`` builds the spanning tree from the
    Sinkhorn duals (prefer arcs with small reduced cost M - f - g) instead
    of the flow indicators — measured ~10-30% fewer exact-cleanup pivots;
    'flow' matches the reference's ranking semantics.
    """
    eps = reg * jnp.max(M)
    f, g = sinkhorn_potentials(s, d, M, eps, num_iters=sinkhorn_iters)
    Xs = round_to_feasible(plan_from_potentials(f, g, M, eps), s, d)
    if tree_weights == "reduced_cost":
        W = -(M - f[:, None] - g[None, :])
    else:
        W = ot_flow_indicators(Xs, s, d)
    X, push_iters = identify_tree_flows(W, s, d)
    obj = jnp.sum(X * M)
    return X, push_iters, obj


@partial(jax.jit, static_argnames=("reg", "sinkhorn_iters", "tree_weights",
                                   "use_pallas"))
def batched_tnet(s, d, M, reg: float = 0.02, sinkhorn_iters: int = 200,
                 tree_weights: str = "flow",
                 use_pallas: bool | None = None):
    """vmapped TNET over an instance batch: s (B,S), d (B,D), M (B,S,D).

    On TPU at eligible shapes the Sinkhorn stage runs as the fused Pallas
    kernel (cost block VMEM-resident for all iterations): measured 2.4x
    the XLA loop at 64x256x256 under the corrected timing protocol, and
    Sinkhorn dominates this pipeline.  Per-instance eps = reg*max(M_i) is
    folded into the cost (the plan is invariant under (M/eps, eps=1)), so
    one static-reg kernel serves the whole batch.
    """
    if use_pallas is None:
        from smart_crossover_tpu.config import on_tpu
        from smart_crossover_tpu.ops.sinkhorn_pallas import pallas_shapes_ok

        use_pallas = (tree_weights == "flow" and on_tpu()
                      and pallas_shapes_ok(M.shape[1], M.shape[2], M.dtype))
    if use_pallas and tree_weights == "flow":
        from smart_crossover_tpu.ops.ranking import ot_flow_indicators
        from smart_crossover_tpu.ops.sinkhorn_pallas import (
            sinkhorn_plan_pallas)
        from smart_crossover_tpu.network_methods.tree_bi import (
            identify_tree_flows)
        from smart_crossover_tpu.solvers.sinkhorn import round_to_feasible

        eps = reg * jnp.max(M, axis=(1, 2))
        Mn = M / eps[:, None, None]
        X0 = sinkhorn_plan_pallas(s, d, Mn, 1.0, num_iters=sinkhorn_iters)

        def rest(X0_, s_, d_, M_):
            Xs = round_to_feasible(X0_, s_, d_)
            W = ot_flow_indicators(Xs, s_, d_)
            X, push_iters = identify_tree_flows(W, s_, d_)
            return X, push_iters, jnp.sum(X * M_)

        return jax.vmap(rest)(X0, s, d, M)
    return jax.vmap(lambda a, b_, c_: tnet_single(a, b_, c_, reg,
                                                  sinkhorn_iters,
                                                  tree_weights))(s, d, M)


def batched_tnet_exact(s, d, M, reg: float = 0.005,
                       sinkhorn_iters: int = 1000, mesh=None,
                       engine: str = "auto",
                       max_pivots: int | None = None):
    """Batched crossover to EXACT optimal vertices.

    ``engine='host'``: device does the heavy approximate work (the batched
    TNET pipeline); the host's native network simplex then cleans each
    instance up from the identified tree basis — usually a handful of
    pivots.  ``engine='device'`` (or a specific device pivot engine:
    'parent', 'anc', 'mask'): the whole solve, pivots included, stays on
    device — measured faster than the host cleanup on the v5e up to
    ~512x512 with 'parent', with 'anc' the 512^2..1024^2 engine
    (BENCH.md).  Every device result is CERTIFIED on the host (exact f64
    vertex + duals recomputed from the returned spanning-tree basis,
    reference acceptance test); instances that fail certification — e.g.
    f32 potential noise at 1024^2 depth leaves reduced costs at ~-4e-6 —
    are repaired by a warm-started native network simplex.  The returned
    vertices are therefore exact f64 regardless of device precision.
    ``engine='auto'`` picks 'device' on TPU for S, D <= 512 without a
    mesh, else 'host'.

    Returns (X, obj, cleanup_pivots, optimal_mask) as numpy arrays.
    """
    import numpy as np

    from smart_crossover_tpu.models import Basis, OptTransport
    from smart_crossover_tpu.solvers.network_simplex import network_simplex

    if engine == "auto":
        from smart_crossover_tpu.config import on_tpu

        Bq, Sq, Dq = jnp.shape(M)
        # parent (one-hot lifting) wins at small sizes where its MXU
        # matmuls are cheap; the ancestor-matrix engine takes over once
        # the per-pivot (V,V) lifting rounds dominate (>= 256^2, and the
        # only engine worth running at 1024^2 — BENCH.md round 3)
        if mesh is None and on_tpu() and max(Sq, Dq) <= 1024:
            # round-4/5 head-to-heads (BENCH.md): parent < 256^2,
            # anc 256^2..512^2, the packed-bitmask engine from 784^2.
            # The Pallas megakernel ('mega') measured 4-20x SLOWER than
            # these at every size live (BENCH.md round 5) and stays out
            # of auto-routing by evidence, not omission.
            if max(Sq, Dq) < 256:
                engine = "parent"
            elif max(Sq, Dq) <= 512:
                engine = "anc"
            else:
                engine = "packed"
        else:
            engine = "host"
    if engine in ("device", "parent", "anc", "packed", "mask", "mega") \
            and mesh is None:
        from smart_crossover_tpu.network_methods.certify import (
            certify_ot_basis_batch,
        )

        dev_engine = "parent" if engine == "device" else engine
        if max_pivots is None:
            # pivot counts from warm starts grow ~linearly in V; 5k is
            # ample through 512^2 but caps out around 1024^2
            Sq, Dq = np.shape(M)[1:]
            max_pivots = max(5000, 8 * (Sq + Dq))
        Xd, obj_d, push, piv, opt, Bm = batched_tnet_exact_device(
            s, d, M, reg=reg, sinkhorn_iters=sinkhorn_iters,
            engine=dev_engine, max_pivots=max_pivots)
        piv_n = np.asarray(piv, dtype=np.int64)
        opt_n = np.asarray(opt, dtype=bool)
        s64 = np.asarray(s, dtype=np.float64)
        d64 = np.asarray(d, dtype=np.float64)
        d64 = d64 * (s64.sum(1) / d64.sum(1))[:, None]  # f32 mass drift
        M64 = np.asarray(M, dtype=np.float64)
        certs = certify_ot_basis_batch(np.asarray(Bm), s64, d64, M64)
        Xn = np.stack([c.x for c in certs])
        obj_n = np.array([c.obj_val for c in certs])
        ok = opt_n & np.array([c.ok for c in certs])
        if ok.all():
            return Xn, obj_n, piv_n, ok
        # certification failures / pivot-capped instances: warm-start the
        # native core from the DEVICE basis (usually a handful of pivots)
        Bm_n = np.asarray(Bm)
        S, D = M64.shape[1:]
        for i in np.flatnonzero(~ok):
            ot = OptTransport(s=s64[i], d=d64[i], M=M64[i])
            mcf = ot.to_MCF()
            vbasis = np.where(Bm_n[i].ravel(), 0, -1).astype(np.int32)
            cbasis = np.concatenate([-np.ones(mcf.m - 1, dtype=np.int32),
                                     [0]])
            res = network_simplex(mcf, warm_basis=Basis(vbasis, cbasis))
            Xn[i] = res.x.reshape(S, D)
            obj_n[i] = res.obj_val
            piv_n[i] += res.iter_count
            ok[i] = res.status == "OPTIMAL"
        return Xn, obj_n, piv_n, ok

    if mesh is not None:
        X, push_iters, obj = sharded_batched_tnet(
            mesh, s, d, M, reg=reg, sinkhorn_iters=sinkhorn_iters)
    else:
        X, push_iters, obj = batched_tnet(s, d, M, reg=reg,
                                          sinkhorn_iters=sinkhorn_iters)
    X = np.asarray(X, dtype=np.float64)
    B, S, D = X.shape
    out_X = np.empty_like(X)
    out_obj = np.empty(B)
    pivots = np.empty(B, dtype=np.int64)
    optimal = np.zeros(B, dtype=bool)

    def cleanup(i: int) -> None:
        si = np.asarray(s[i], dtype=np.float64)
        di = np.asarray(d[i], dtype=np.float64)
        di = di * (si.sum() / di.sum())  # repair f32 mass-balance drift
        ot = OptTransport(s=si, d=di, M=np.asarray(M[i], dtype=np.float64))
        mcf = ot.to_MCF()
        vbasis = np.where(X[i].ravel() > 0, 0, -1).astype(np.int32)
        cbasis = np.concatenate([-np.ones(mcf.m - 1, dtype=np.int32), [0]])
        res = network_simplex(mcf, warm_basis=Basis(vbasis, cbasis))
        out_X[i] = res.x.reshape(S, D)
        out_obj[i] = res.obj_val
        pivots[i] = res.iter_count
        optimal[i] = res.status == "OPTIMAL"

    # the native core releases the GIL during the ctypes call, so threads
    # scale the host cleanup across cores
    import concurrent.futures as cf
    import os

    workers = min(max(os.cpu_count() or 1, 1), 8)
    if workers > 1 and B > 1:
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(cleanup, range(B)))
    else:
        for i in range(B):
            cleanup(i)
    return out_X, out_obj, pivots, optimal


def sharded_batched_tnet_exact_device(mesh, s, d, M, reg: float = 0.005,
                                      sinkhorn_iters: int = 1000,
                                      max_pivots: int = 5000,
                                      engine: str = "parent"):
    """Batch-shard the fully-device-resident EXACT pipeline (TNET warm
    start + transportation simplex to optimality) over the mesh 'batch'
    axis.  Each instance's pivot loop stays on its home device; there are
    no cross-instance collectives, so scaling is embarrassingly parallel
    across chips."""
    shard = NamedSharding(mesh, P("batch"))
    if engine == "mega":
        # the megakernel is a pallas_call with a batch grid — not
        # auto-partitionable under jit shardings, so shard_map hands each
        # device its LOCAL batch slice and runs the kernel per shard
        from jax.experimental.shard_map import shard_map

        fn = jax.jit(shard_map(
            lambda s_, d_, M_: batched_tnet_exact_device(
                s_, d_, M_, reg=reg, sinkhorn_iters=sinkhorn_iters,
                max_pivots=max_pivots, engine="mega"),
            mesh=mesh, in_specs=(P("batch"),) * 3,
            out_specs=(P("batch"),) * 6, check_rep=False))
    else:
        fn = jax.jit(
            lambda s_, d_, M_: batched_tnet_exact_device(
                s_, d_, M_, reg=reg, sinkhorn_iters=sinkhorn_iters,
                max_pivots=max_pivots, engine=engine,
                chunk_b=s_.shape[0]),      # vmap path: no lax.map rechunk
            in_shardings=(shard, shard, shard),
            out_shardings=(shard,) * 6)
    s = jax.device_put(s, shard)
    d = jax.device_put(d, shard)
    M = jax.device_put(M, shard)
    return fn(s, d, M)


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


@partial(jax.jit, static_argnames=("reg", "sinkhorn_iters", "max_pivots",
                                   "engine", "chunk_b"))
def batched_tnet_exact_device(s, d, M, reg: float = 0.005,
                              sinkhorn_iters: int = 1000,
                              max_pivots: int = 5000,
                              engine: str = "parent",
                              chunk_b: int | None = None):
    """EXACT batched OT crossover, fully device-resident.

    The TNET pipeline identifies a feasible tree vertex per instance; its
    support is completed to a spanning-tree basis (Borůvka over the support
    indicator) and the batched device transportation simplex pivots to
    optimality — no host round trip.

    ``engine='parent'`` (default) uses the parent-array/binary-lifting
    simplex (ops/transport_simplex_parent.py): O(V log V) gathers per pivot
    plus one dense pricing pass.  ``engine='anc'`` uses the ancestor-matrix
    simplex (ops/transport_simplex_anc.py): incremental root-path algebra,
    O(V^2) bool elementwise per pivot — the asymptotically lean engine for
    512^2..1024^2.  ``engine='mask'`` keeps the original dense-propagation
    implementation (ops/transport_simplex.py) as the correctness oracle.

    ``chunk_b`` splits the batch into lax.map chunks of that many
    instances.  The pivot loop is ~1000x faster when its carried state
    fits VMEM (measured on the v5e: 16x128^2 pivots at ~3.5 us, 16x256^2
    at ~6 ms — the spill cliff), so large instances want SMALL chunks.
    Default: largest power-of-2 divisor of B keeping the chunk's dense
    working set under ~6 MB.

    Returns (X, obj, push_iters, pivots, optimal_mask, basis_mask);
    the (B, S, D) boolean basis_mask is the final spanning-tree basis,
    from which network_methods.certify recomputes the exact f64 vertex.
    """
    from smart_crossover_tpu.ops.mst import boruvka_bipartite_mst
    from smart_crossover_tpu.ops.transport_simplex import transport_simplex
    from smart_crossover_tpu.ops.transport_simplex_anc import (
        transport_simplex_anc,
    )
    from smart_crossover_tpu.ops.transport_simplex_packed import (
        transport_simplex_packed,
    )
    from smart_crossover_tpu.ops.transport_simplex_parent import (
        transport_simplex_parent,
    )

    pivot_fn = {"parent": transport_simplex_parent,
                "anc": transport_simplex_anc,
                "packed": transport_simplex_packed,
                "mask": transport_simplex}.get(engine)

    def one(s_, d_, M_):
        X0, push_iters, _ = tnet_single(s_, d_, M_, reg, sinkhorn_iters)
        support = (X0 > 1e-12).astype(M_.dtype)
        Bm = boruvka_bipartite_mst(support)
        X, Bm2, pivots, optimal = pivot_fn(
            X0, Bm, M_, s_, d_, max_pivots=max_pivots)
        return X, jnp.sum(X * M_), push_iters, pivots, optimal, Bm2

    s = jnp.asarray(s)
    d = jnp.asarray(d)
    M = jnp.asarray(M)
    B, S, D = M.shape

    if engine == "mega":
        # the Pallas megakernel batches internally (grid over instances);
        # only the warm-start pipeline is vmapped
        from smart_crossover_tpu.ops.transport_simplex_mega import (
            batched_transport_simplex_mega,
        )

        def warm(s_, d_, M_):
            X0, push_iters, _ = tnet_single(s_, d_, M_, reg, sinkhorn_iters)
            support = (X0 > 1e-12).astype(M_.dtype)
            return X0, boruvka_bipartite_mst(support), push_iters

        X0, Bm0, push = jax.vmap(warm)(s, d, M)
        X, Bm2, pivots, optimal = batched_transport_simplex_mega(
            X0, Bm0, M, max_pivots=max_pivots)
        return (X, jnp.sum(X * M, axis=(1, 2)), push, pivots, optimal,
                Bm2)
    if chunk_b is None:
        budget = 6 * 1024 * 1024
        per_inst = 4 * S * D * jnp.dtype(M.dtype).itemsize  # ~4 dense bufs
        chunk_b = B
        while chunk_b > 1 and (B % chunk_b or chunk_b * per_inst > budget):
            chunk_b = max(1, chunk_b // 2)
    if chunk_b >= B:
        return jax.vmap(one)(s, d, M)
    G = B // chunk_b
    out = jax.lax.map(
        lambda args: jax.vmap(one)(*args),
        (s.reshape(G, chunk_b, S), d.reshape(G, chunk_b, D),
         M.reshape(G, chunk_b, S, D)))
    return tuple(o.reshape((B,) + o.shape[2:]) for o in out)
