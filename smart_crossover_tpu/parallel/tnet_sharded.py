"""Model-parallel TNET: ONE large OT instance sharded across the mesh.

The demand axis is partitioned over the 'model' mesh axis: every device owns
W_loc = W[:, j0:j0+Dloc] — a demander's full edge column is local, while
supplier-side reductions cross shards.  All four pipeline stages run inside
one shard_map:

* Sinkhorn          — row logsumexp via pmax+psum (as parallel/projector.py)
* Borůvka MST       — per-supplier best edge via a two-phase
                      (pmax weight, pmin edge-id) reduction; component
                      bookkeeping on replicated (S+D) arrays
* tree solve        — leaf elimination; demander side local, supplier side
                      via the same two-phase reduction
* irrigation push   — global argmin/argmax through pmax/pmin tricks

The result is a basic feasible vertex flow of the full instance, held
column-sharded.  Collectives are all small (O(S) or O(S+D)) vectors riding
the ICI; the O(S*D) heavy math never leaves its shard.

TPU note: all loop-carried index chasing (component lookups, pointer
jumping, segment max/min/sum, leaf scatters) runs as one-hot matmuls /
masked reductions — vector gathers and scatters serialize on TPU (see
ops/transport_simplex_parent.py; measured 200 µs vs 38 µs per round).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from smart_crossover_tpu.ops.mst import _take_f, _take_i
from smart_crossover_tpu.parallel.mesh import MODEL_AXIS

_BIG_ID = jnp.iinfo(jnp.int32).max


def _global_best(w_loc, id_loc, axis_name):
    """Two-phase cross-shard argmax: (max weight, min global id at max)."""
    wmax = jax.lax.pmax(w_loc, axis_name)
    cand = jnp.where((w_loc == wmax) & jnp.isfinite(wmax), id_loc, _BIG_ID)
    gid = jax.lax.pmin(cand, axis_name)
    return wmax, gid


def sharded_tnet_single(mesh, s, d, M, reg: float = 0.01,
                        sinkhorn_iters: int = 200,
                        push_iters_cap: int = 100_000):
    """Run the TNET basis-identification pipeline on one sharded OT.

    Args:
        mesh: a mesh with a 'model' axis whose width divides D.
        s: (S,), d: (D,), M: (S, D).

    Returns:
        (X, push_iters): the (S, D) basic feasible vertex flow (gathered to
        host numpy) and the push-iteration count.
    """
    S, D = M.shape
    Pw = mesh.shape[MODEL_AXIS]
    assert D % Pw == 0, "mesh width must divide the demand axis"
    Dloc = D // Pw
    V = S + D
    jump_rounds = int(math.ceil(math.log2(max(V, 2)))) + 1
    mst_rounds = int(math.ceil(math.log2(max(V, 2)))) + 2

    colM = NamedSharding(mesh, P(None, MODEL_AXIS))
    colv = NamedSharding(mesh, P(MODEL_AXIS))
    rep = NamedSharding(mesh, P())
    dt = jnp.asarray(M).dtype
    M_ = jax.device_put(jnp.asarray(M), colM)
    s_ = jax.device_put(jnp.asarray(s, dt), rep)
    d_ = jax.device_put(jnp.asarray(d, dt), colv)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(MODEL_AXIS), P(None, MODEL_AXIS)),
             out_specs=(P(None, MODEL_AXIS), P()), check_vma=False)
    def _run(s_full, d_loc, M_loc):
        ax = MODEL_AXIS
        shard = jax.lax.axis_index(ax)
        j_base = shard * Dloc                       # global col offset
        gcols = j_base + jnp.arange(Dloc, dtype=jnp.int32)
        srows = jnp.arange(S, dtype=jnp.int32)
        eps = reg * jax.lax.pmax(jnp.max(M_loc), ax)

        # ---- sinkhorn (log domain, sharded cols) --------------------------
        log_s = jnp.log(s_full)
        log_d = jnp.log(d_loc)

        def sk_body(_, fg):
            f, g = fg
            t = (g[None, :] - M_loc) / eps
            tmax = jax.lax.pmax(jnp.max(t, axis=1), ax)
            ssum = jax.lax.psum(
                jnp.sum(jnp.exp(t - tmax[:, None]), axis=1), ax)
            f = eps * (log_s - (tmax + jnp.log(ssum)))
            t2 = (f[:, None] - M_loc) / eps
            t2m = jnp.max(t2, axis=0)
            g = eps * (log_d - (t2m + jnp.log(
                jnp.sum(jnp.exp(t2 - t2m[None, :]), axis=0))))
            return f, g

        f, g = jax.lax.fori_loop(0, sinkhorn_iters, sk_body,
                                 (jnp.zeros_like(log_s),
                                  jnp.zeros_like(log_d)))
        X = jnp.exp((f[:, None] + g[None, :] - M_loc) / eps)
        # round to exact sharded marginals
        row = jax.lax.psum(jnp.sum(X, axis=1), ax)
        X = X * jnp.minimum(1.0, s_full / jnp.where(row > 0, row, 1.0))[:, None]
        col = jnp.sum(X, axis=0)
        X = X * jnp.minimum(1.0, d_loc / jnp.where(col > 0, col, 1.0))[None, :]
        err_r = s_full - jax.lax.psum(jnp.sum(X, axis=1), ax)
        err_c = d_loc - jnp.sum(X, axis=0)
        tot = jax.lax.psum(jnp.sum(err_c), ax)
        X = X + jnp.outer(err_r, err_c) / jnp.where(tot > 0, tot, 1.0)

        # ---- flow indicators ---------------------------------------------
        W = jnp.maximum(X / s_full[:, None], X / d_loc[None, :])

        # ---- Borůvka MST (components replicated over V nodes) ------------
        def mst_body(state):
            comp, tree_loc, _, it = state
            comp_s = comp[:S]
            # contiguous slice of this shard's demander components
            comp_dl = jax.lax.dynamic_slice(comp, (S + j_base,), (Dloc,))
            cross = comp_s[:, None] != comp_dl[None, :]
            Wm = jnp.where(cross, W, -jnp.inf)
            # per-supplier best edge (cross-shard)
            bj = jnp.argmax(Wm, axis=1).astype(jnp.int32)
            bw_s = jnp.max(Wm, axis=1)
            eid_s = srows * D + (j_base + bj)
            eid_s = jnp.where(jnp.isfinite(bw_s), eid_s, _BIG_ID)
            bw_s_g, eid_s_g = _global_best(bw_s, eid_s, ax)
            # per-demander best edge (local column)
            bi = jnp.argmax(Wm, axis=0).astype(jnp.int32)
            bw_d = jnp.max(Wm, axis=0)
            eid_d = bi * D + gcols
            eid_d = jnp.where(jnp.isfinite(bw_d), eid_d, _BIG_ID)

            # component champions over the V-node id space (masked one-hot
            # reductions in place of segment ops)
            cid = jnp.arange(V, dtype=comp.dtype)
            node_w_s = jnp.where(jnp.isfinite(bw_s_g), bw_s_g, -jnp.inf)
            OHs = comp_s[:, None] == cid[None, :]           # (S, V)
            OHd = comp_dl[:, None] == cid[None, :]          # (Dloc, V)
            comp_w = jnp.max(
                jnp.where(OHs, node_w_s[:, None], -jnp.inf), axis=0)
            comp_w_d = jnp.max(
                jnp.where(OHd, bw_d[:, None], -jnp.inf), axis=0)
            comp_w = jnp.maximum(comp_w, jax.lax.pmax(comp_w_d, ax))

            comp_w_f = jnp.where(jnp.isfinite(comp_w), comp_w,
                                 jnp.asarray(-1e30, W.dtype))
            cand_s = jnp.where(node_w_s == _take_f(comp_w_f, comp_s, V),
                               eid_s_g, _BIG_ID)
            comp_eid_s = jnp.min(
                jnp.where(OHs, cand_s[:, None], _BIG_ID), axis=0)
            cand_d = jnp.where(bw_d == _take_f(comp_w_f, comp_dl, V),
                               eid_d, _BIG_ID)
            comp_eid_d = jnp.min(
                jnp.where(OHd, cand_d[:, None], _BIG_ID), axis=0)
            comp_eid = jnp.minimum(comp_eid_s,
                                   jax.lax.pmin(comp_eid_d, ax))

            pick = comp_eid < _BIG_ID
            any_pick = jnp.any(pick)
            safe = jnp.where(pick, comp_eid, 0)
            pi = safe // D
            pj = safe % D
            # local mark of picked edges: scatter-OR as a one-hot product
            in_shard = pick & (pj >= j_base) & (pj < j_base + Dloc)
            OH_pi = ((pi[:, None] == srows[None, :]) & in_shard[:, None]
                     ).astype(W.dtype)                      # (V, S)
            OH_pj = ((pj - j_base)[:, None]
                     == jnp.arange(Dloc, dtype=jnp.int32)[None, :]
                     ).astype(W.dtype)                      # (V, Dloc)
            picked = jax.lax.dot_general(
                OH_pi, OH_pj, (((0,), (0,)), ((), ())),
                preferred_element_type=W.dtype,
                precision=jax.lax.Precision.HIGHEST)
            tree_loc = tree_loc | (picked > 0.5)
            # hook + compress (replicated arithmetic, one-hot gathers)
            e_cs = _take_i(comp, pi, V)
            e_cd = _take_i(comp, S + pj, V)
            other = jnp.where(e_cs == cid, e_cd, e_cs)
            parent = jnp.where(pick, other, cid)
            mutual = _take_i(parent, parent, V) == cid
            parent = jnp.where(mutual & (cid < parent), cid, parent)
            for _ in range(jump_rounds):
                parent = _take_i(parent, parent, V)
            comp = _take_i(parent, comp, V)
            return comp, tree_loc, any_pick, it + 1

        def mst_cond(state):
            _, _, changed, it = state
            return changed & (it < mst_rounds)

        comp0 = jnp.arange(V, dtype=jnp.int32)
        tree0 = jnp.zeros((S, Dloc), dtype=bool)
        _, tree_loc, _, _ = jax.lax.while_loop(
            mst_cond, mst_body, (comp0, tree0, jnp.asarray(True),
                                 jnp.asarray(0)))

        # ---- tree solve (leaf elimination, supplier side cross-shard) ----
        def ts_body(state):
            # leaf rounds as one-hot products: a leaf row's single active
            # edge one-hot IS its active row — locally zero when the edge
            # lives on another shard, which is exactly the owner scatter
            act, rs, rd, Xf, it = state
            hi = jax.lax.Precision.HIGHEST
            deg_s = jax.lax.psum(jnp.sum(act, axis=1), ax)
            leaf_s = deg_s == 1
            oh_j = (act & leaf_s[:, None]).astype(dt)        # (S, Dloc)
            flow_s = jnp.where(leaf_s, rs, 0.0)
            Xf = Xf + flow_s[:, None] * oh_j
            rd = rd - jax.lax.dot_general(
                flow_s, oh_j, (((0,), (0,)), ((), ())),
                preferred_element_type=dt, precision=hi)
            rs = rs - flow_s
            act = act & ~leaf_s[:, None]

            deg_d = jnp.sum(act, axis=0)
            leaf_d = deg_d == 1
            oh_i = (act & leaf_d[None, :]).astype(dt)        # (S, Dloc)
            flow_d = jnp.where(leaf_d, rd, 0.0)
            Xf = Xf + flow_d[None, :] * oh_i
            rs = rs - jax.lax.psum(jax.lax.dot_general(
                oh_i, flow_d, (((1,), (0,)), ((), ())),
                preferred_element_type=dt, precision=hi), ax)
            rd = rd - flow_d
            act = act & ~leaf_d[None, :]
            return act, rs, rd, Xf, it + 1

        def ts_cond(state):
            act, _, _, _, it = state
            return jax.lax.psum(jnp.sum(act), ax) > 0

        Xt0 = jnp.zeros((S, Dloc), dt)
        _, _, _, Xt, _ = jax.lax.while_loop(
            ts_cond, ts_body,
            (tree_loc, s_full.astype(dt), d_loc.astype(dt), Xt0,
             jnp.asarray(0)))

        # ---- irrigation push ---------------------------------------------
        def push_body(state):
            Xf, it = state
            # global argmin
            lmin = jnp.min(Xf)
            lminid = jnp.argmin(Xf.reshape(-1)).astype(jnp.int32)
            li = lminid // Dloc
            lj = lminid % Dloc
            gid = li * D + (j_base + lj)
            _, gmin_id = _global_best(-lmin, gid, ax)
            I1 = gmin_id // D
            J1 = gmin_id % D
            # J2 = argmax of row I1 (cross-shard)
            rowv = Xf[I1]
            j2l = jnp.argmax(rowv).astype(jnp.int32)
            _, J2 = _global_best(rowv[j2l], j_base + j2l, ax)
            # I2 = argmax of column J1 (local to its owner; broadcast)
            ownJ1 = (J1 >= j_base) & (J1 < j_base + Dloc)
            colv_ = jnp.where(ownJ1, Xf[:, jnp.where(ownJ1, J1 - j_base, 0)],
                              -jnp.inf)
            i2l = jnp.argmax(colv_).astype(jnp.int32)
            _, I2 = _global_best(
                jnp.where(ownJ1, colv_[i2l], -jnp.inf), i2l, ax)
            # gather the three pivot values
            def val(i, j):
                ownj = (j >= j_base) & (j < j_base + Dloc)
                v = jnp.where(ownj, Xf[i, jnp.where(ownj, j - j_base, 0)],
                              -jnp.inf)
                return jax.lax.pmax(v, ax)

            x11 = val(I1, J1)
            x12 = val(I1, J2)
            x21 = val(I2, J1)
            theta = jnp.minimum(jnp.minimum(-x11, x12), x21)

            def upd(Xf, i, j, delta):
                ownj = (j >= j_base) & (j < j_base + Dloc)
                jl = jnp.where(ownj, j - j_base, 0)
                return Xf.at[i, jl].add(jnp.where(ownj, delta, 0.0))

            Xf = upd(Xf, I1, J1, theta)
            Xf = upd(Xf, I2, J1, -theta)
            Xf = upd(Xf, I1, J2, -theta)
            Xf = upd(Xf, I2, J2, theta)
            return Xf, it + 1

        def push_cond(state):
            Xf, it = state
            return (jax.lax.pmin(jnp.min(Xf), ax) < 0) & (
                it < push_iters_cap)

        Xt, push_n = jax.lax.while_loop(push_cond, push_body,
                                        (Xt, jnp.asarray(0)))
        return Xt, push_n

    X, push_n = jax.jit(_run)(s_, d_, M_)
    return np.asarray(X, dtype=np.float64), int(push_n)
