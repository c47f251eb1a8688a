"""Batched transportation simplex on device.

The BASELINE north star asks for simplex pricing/ratio tests as batched
device kernels (the capability the reference buys from vendor network
simplex, reference net_manager.py:211-222).  For optimal transport (uncapacitated bipartite MCF) the
whole primal network simplex vectorises:

* potentials (u, v) by masked propagation over the basis tree
  (O(diameter) dense rounds);
* pricing: one dense reduced-cost matrix ``M - u - v`` and an argmin;
* cycle finding: the entering arc's unique tree cycle is recovered by a
  bipartite tree solve (ops/tree.py) with a unit source/sink pair — the
  returned signed path flows ARE the cycle directions;
* ratio test: dense masked min of X / z over the positive-direction cells.

Everything is jittable and vmaps over an instance batch: pivots execute in
lockstep across instances (each instance freezes once optimal).  Warm-start
with the TNET tree basis and the pivot count stays small, which makes
EXACT batched OT crossover fully device-resident.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from smart_crossover_tpu.ops.tree import bipartite_tree_solve


def tree_potentials(Bm, M, max_rounds: int | None = None):
    """Dual potentials (u, v) with u_i + v_j = M_ij on basis cells.

    Root: row 0 (u_0 = 0); masked propagation until every row/column of the
    spanning tree is assigned.
    """
    S, D = M.shape
    if max_rounds is None:
        max_rounds = S + D + 2
    NEG = jnp.asarray(-jnp.inf, M.dtype)

    def body(state):
        u, v, au, av, it = state
        # columns reachable from assigned rows
        cand_v = jnp.where(Bm & au[:, None], M - u[:, None], NEG)
        v_new = jnp.max(cand_v, axis=0)
        av_new = av | jnp.isfinite(v_new)
        v = jnp.where(av, v, jnp.where(jnp.isfinite(v_new), v_new, v))
        # rows reachable from assigned columns
        cand_u = jnp.where(Bm & av_new[None, :], M - v[None, :], NEG)
        u_new = jnp.max(cand_u, axis=1)
        au_new = au | jnp.isfinite(u_new)
        u = jnp.where(au, u, jnp.where(jnp.isfinite(u_new), u_new, u))
        return u, v, au_new, av_new, it + 1

    def cond(state):
        _, _, au, av, it = state
        return ~(jnp.all(au) & jnp.all(av)) & (it < max_rounds)

    u0 = jnp.zeros(S, M.dtype)
    v0 = jnp.zeros(D, M.dtype)
    au0 = jnp.zeros(S, bool).at[0].set(True)
    av0 = jnp.zeros(D, bool)
    u, v, *_ = jax.lax.while_loop(cond, body, (u0, v0, au0, av0,
                                               jnp.asarray(0)))
    return u, v


@partial(jax.jit, static_argnames=("max_pivots",))
def transport_simplex(X, Bm, M, s, d,
                      tol: float = 1e-7,
                      max_pivots: int = 5000):
    """Pivot a basic feasible transport plan to optimality.

    Args:
        X: (S, D) basic feasible plan (row sums s, col sums d).
        Bm: (S, D) spanning-tree basis mask (S + D - 1 cells; X > 0 implies
            Bm, degenerate basis cells may carry zero flow).
        M: (S, D) costs.

    Returns:
        (X_opt, Bm_opt, pivots, optimal_flag).
    """
    S, D = M.shape

    def body(state):
        X, Bm, it, _ = state
        u, v = tree_potentials(Bm, M)
        delta = M - u[:, None] - v[None, :]
        delta = jnp.where(Bm, jnp.asarray(0.0, M.dtype), delta)
        flat = jnp.argmin(delta.reshape(-1))
        dmin = delta.reshape(-1)[flat]
        done = dmin >= -tol
        ei = flat // D
        ej = flat % D

        # cycle: unit flow from row ei to col ej through the tree
        z = bipartite_tree_solve(
            Bm,
            jnp.zeros(S, M.dtype).at[ei].set(1.0),
            jnp.zeros(D, M.dtype).at[ej].set(1.0))
        pos = z > 1e-9
        ratios = jnp.where(pos, X / jnp.where(pos, z, 1.0), jnp.inf)
        theta = jnp.min(ratios)
        # leaving cell: min ratio, deterministic flat-index tie-break
        leave_flat = jnp.argmin(
            jnp.where(ratios.reshape(-1) <= theta + 1e-12,
                      jax.lax.broadcasted_iota(jnp.int32, (S * D, 1),
                                               0).squeeze(-1),
                      S * D).astype(jnp.int32))
        li = leave_flat // D
        lj = leave_flat % D

        X_new = X - theta * z
        X_new = X_new.at[ei, ej].add(theta)
        X_new = jnp.maximum(X_new, 0.0)
        X_new = X_new.at[li, lj].set(0.0)
        Bm_new = Bm.at[ei, ej].set(True).at[li, lj].set(False)

        X = jnp.where(done, X, X_new)
        Bm = jnp.where(done, Bm, Bm_new)
        return X, Bm, it + (~done).astype(jnp.int32), done

    def cond(state):
        _, _, it, done = state
        return (~done) & (it < max_pivots)

    X, Bm, pivots, done = jax.lax.while_loop(
        cond, body, (jnp.asarray(X), jnp.asarray(Bm), jnp.asarray(0),
                     jnp.asarray(False)))
    # final optimality evaluation (done may be False only at pivot cap)
    u, v = tree_potentials(Bm, M)
    delta = jnp.where(Bm, 0.0, M - u[:, None] - v[None, :])
    optimal = jnp.min(delta) >= -tol
    return X, Bm, pivots, optimal


@partial(jax.jit, static_argnames=("max_pivots",))
def batched_transport_simplex(X, Bm, M, s, d, tol: float = 1e-7,
                              max_pivots: int = 5000):
    """vmapped transport simplex over an instance batch."""
    return jax.vmap(
        lambda X_, B_, M_, s_, d_: transport_simplex(
            X_, B_, M_, s_, d_, tol, max_pivots)
    )(X, Bm, M, s, d)
