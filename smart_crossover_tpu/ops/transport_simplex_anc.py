"""Ancestor-matrix batched transportation simplex on device.

Third-generation device simplex (VERDICT r2 item 3: the parent-array
engine's O(V^2 log V) per-pivot lifting plus two (V,S)x(S,D) tree-cell
matmuls hit a wall at 1024^2).  This engine maintains the ROOT-PATH
INDICATOR MATRIX N (V,V bool: N[u,w] = 1 iff w is on u's root path,
inclusive of u and root) INCREMENTALLY across pivots, so each pivot costs

* pricing: one dense O(S*D) elementwise pass + argmin (irreducible);
* a handful of O(V^2) BOOL elementwise/reduction updates of N — XOR row
  algebra: for every node u in the re-hung subtree C,
      newpath(u) = (path(u) XOR path(e_same)) + LCA(u, e_same)
                   + path(e_other),
  where C = N[:, cl], the cycle = N[x] XOR N[y] (keyed by child nodes),
  and the per-u LCA is the deepest common node — all read off N directly;
* ONE (3,V)x(V,V) one-hot product against the parent map (the reversed
  path segment re-keys its edges child -> old parent);
* O(V) incremental updates of the potentials (all row nodes of C shift
  by +/-delta and all column nodes by the opposite — in a bipartite tree
  depth parity IS the node side), the tree-cell costs w (re-keyed
  exactly, never recomputed) and the tree-cell flows Xv.

The dense plan is NOT touched per pivot: the ratio test needs only tree
cells, so X is reconstructed from (parent, Xv) once at exit.  Potentials
are refreshed from the exact w every ``refresh`` pivots (and at exit) to
bound f32 drift of the incremental shifts; the ancestor matrix is built
once per solve with log2(V) boolean-matmul doubling rounds.

Replaces the capability the reference buys from vendor network simplex
(reference net_manager.py:211-222) for the OT/bipartite case at sizes the
reference actually ran (1024^2-class);
ops/transport_simplex{,_parent}.py remain the correctness oracles.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from smart_crossover_tpu.ops.transport_simplex_parent import (
    _chain,
    build_parent_from_mask,
)

_HI = jax.lax.Precision.HIGHEST


def _num_levels(V: int) -> int:
    K = 1
    while (1 << K) < V:
        K += 1
    return K


def build_ancestor_matrix(parent, dtype=jnp.float32):
    """N[u, w] = 1 iff w is on u's root path (inclusive of u and root).

    K doubling rounds of (V,V)x(V,V) one-hot matmuls — O(K V^3) flops,
    paid ONCE per solve (amortised over the pivot run, where it replaces
    per-pivot lifting)."""
    V = parent.shape[0]
    iota = jnp.arange(V, dtype=dtype)
    N = jnp.eye(V, dtype=dtype)
    ptr = parent.astype(dtype)
    for _ in range(_num_levels(V)):
        OH = (ptr[:, None] == iota[None, :]).astype(dtype)
        # path within 2^k hops: N' = N + N[ptr]; ptr' = ptr[ptr]
        N = N + jax.lax.dot_general(OH, N, (((1,), (0,)), ((), ())),
                                    preferred_element_type=dtype,
                                    precision=_HI)
        ptr = jax.lax.dot_general(OH, ptr[:, None],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=dtype,
                                  precision=_HI)[:, 0]
    return N > 0.5


def _tree_cells(parent, S, D):
    """Tree cell (row, col) represented by each non-root child node."""
    V = S + D
    vids = jnp.arange(V, dtype=jnp.int32)
    is_row = vids < S
    ci = jnp.where(is_row, vids, parent)
    cj = jnp.where(is_row, parent - S, vids - S)
    return ci, cj, parent != vids


def _cell_values(A, ci, cj, notroot, dtype):
    """A[ci(v), cj(v)] for all nodes v via one-hot matmuls (init/exit only)."""
    S, D = A.shape
    E_r = ((ci[:, None] == jnp.arange(S, dtype=jnp.int32)[None, :])
           & notroot[:, None]).astype(dtype)
    T = jax.lax.dot_general(E_r, A, (((1,), (0,)), ((), ())),
                            preferred_element_type=dtype, precision=_HI)
    E_c = ((cj[:, None] == jnp.arange(D, dtype=jnp.int32)[None, :])
           & notroot[:, None]).astype(dtype)
    return jnp.sum(T * E_c, axis=1)


def _row_of(Nb, i):
    """Row i of the bool ancestor matrix (contiguous dynamic slice)."""
    return jax.lax.dynamic_slice_in_dim(Nb, i, 1, axis=0)[0]


@partial(jax.jit, static_argnames=("max_pivots", "refresh"))
def transport_simplex_anc(X, Bm, M, s, d,
                          tol: float = 1e-7,
                          max_pivots: int = 5000,
                          refresh: int = 128):
    """Pivot a basic feasible transport plan to optimality (ancestor-matrix).

    Same contract as ops.transport_simplex.transport_simplex:

    Args:
        X: (S, D) basic feasible plan (row sums s, col sums d).
        Bm: (S, D) spanning-tree basis mask.
        M: (S, D) costs.

    Returns:
        (X_opt, Bm_opt, pivots, optimal_flag).
    """
    S, D = M.shape
    V = S + D
    K = _num_levels(V)
    dtype = M.dtype
    M = jnp.asarray(M, dtype)
    vids = jnp.arange(V, dtype=jnp.int32)
    is_row_node = vids < S
    iota_s = jnp.arange(S, dtype=jnp.int32)
    iota_d = jnp.arange(D, dtype=jnp.int32)

    parent0 = build_parent_from_mask(Bm)
    N0 = build_ancestor_matrix(parent0, dtype)
    ci0, cj0, notroot0 = _tree_cells(parent0, S, D)
    w0 = _cell_values(M, ci0, cj0, notroot0, dtype)
    Xv0 = _cell_values(jnp.asarray(X, dtype), ci0, cj0, notroot0, dtype)
    Bm0 = jnp.asarray(Bm, bool)

    def pivot_body(state):
        N, dep, parent, pot, w, Xv, Bmk, it, _ = state
        u, v = pot[:S], pot[S:]

        # pricing over non-basic cells (the one dense O(S*D) op)
        delta = jnp.where(Bmk, jnp.asarray(0.0, dtype),
                          M - u[:, None] - v[None, :])
        flat = jnp.argmin(delta.reshape(-1))
        dmin = delta.reshape(-1)[flat]
        done = dmin >= -tol
        ei = (flat // D).astype(jnp.int32)
        ej = (flat % D).astype(jnp.int32)
        x_end = ei
        y_end = S + ej

        anc_x = _row_of(N, x_end)
        anc_y = _row_of(N, y_end)
        oncycle = anc_x ^ anc_y          # cycle EDGES, keyed by child node

        # bipartite alternation: x_end is a row node, so a cycle cell
        # changes by -theta iff (on x's branch and keyed by a row node)
        # or (on y's branch and keyed by a column node)
        sign = jnp.where(anc_x,
                         jnp.where(is_row_node, -1.0, 1.0),
                         jnp.where(is_row_node, 1.0, -1.0)).astype(dtype)
        sign = jnp.where(oncycle, sign, 0.0)

        dec = oncycle & (sign < 0)
        ratios = jnp.where(dec, Xv, jnp.asarray(jnp.inf, dtype))
        theta = jnp.min(ratios)
        cl = jnp.argmin(jnp.where(
            ratios <= theta + jnp.asarray(1e-12, dtype), vids, V
        ).astype(jnp.int32)).astype(jnp.int32)

        # re-hung component C = old subtree of cl = {u : cl on path(u)};
        # a strided column slice is fine once per pivot
        C = jax.lax.dynamic_slice_in_dim(N, cl, 1, axis=1)[:, 0]
        on_x_side = anc_x[cl]
        e_same = jnp.where(on_x_side, x_end, y_end)
        e_other = jnp.where(on_x_side, y_end, x_end)
        n_es = jnp.where(on_x_side, anc_x, anc_y)
        n_eo = jnp.where(on_x_side, anc_y, anc_x)

        # --- N update: XOR row algebra ------------------------------------
        # two fused V^2 passes: (1) the lca-depth max-reduce, (2) the
        # row rewrite with the NEW row sums (dep) reduced in the same
        # pass — dep is carried state, never recomputed standalone
        common = N & n_es[None, :]
        lca_dep = jnp.max(jnp.where(common, dep[None, :], -1), axis=1)
        keep = (done | ~C)[:, None]
        N_new = (N ^ n_es[None, :]) \
            | (common & (dep[None, :] == lca_dep[:, None])) \
            | n_eo[None, :]
        N = jnp.where(keep, N, N_new)
        dep_next = jnp.sum(N, axis=1, dtype=jnp.int32) - 1  # fuses with write

        # --- potentials: the entering arc must price to zero across the
        # C boundary; within C relative potentials are unchanged ----------
        row_shift = jnp.where(on_x_side, dmin, -dmin).astype(dtype)
        pot_new = pot + jnp.where(
            C, jnp.where(is_row_node, row_shift, -row_shift), 0.0)
        pot = jnp.where(done, pot, pot_new)

        # --- reversed path segment e_same..cl: every edge re-keys
        # child -> old parent; cl's old slot is the leaving arc and is
        # overwritten by its on-path child's value ------------------------
        anc_e = n_es
        seg = anc_e & (dep >= dep[cl])           # path nodes e_same..cl
        src = seg & (vids != cl)                 # edges that re-key
        Xv_upd = Xv + sign * theta
        # entering cell cost: after the shift the entering arc prices to
        # zero, so M[ei,ej] = u'[ei] + v'[ej] exactly
        m_enter = (jnp.sum(jnp.where(vids == x_end, pot_new, 0.0))
                   + jnp.sum(jnp.where(vids == y_end, pot_new, 0.0)))

        # O(V) path scatter: every re-keying edge writes (Xv, w, child-id,
        # hit) to its old parent's slot.  Targets on the path are distinct
        # (parent is injective along a root path), so a single scatter-add
        # into a (V, 4) buffer replaces the former (3,V)x(V,V) one-hot
        # matmuls — which materialised an f32 VxV operand, ~32 MB of HBM
        # traffic per pivot at 1024^2, more than all the bool-N algebra
        # combined (VERDICT r3 item 3).
        tgt = jnp.where(src, parent, V)      # out-of-range rows drop
        vals = jnp.stack([jnp.where(src, Xv_upd, 0.0),
                          jnp.where(src, w, 0.0),
                          src.astype(dtype) * vids.astype(dtype),
                          src.astype(dtype)], axis=1)       # (V, 4)
        moved = jnp.zeros((V + 1, 4), dtype).at[tgt].add(
            vals, mode="drop")[:V]
        hit = moved[:, 3] > 0.5

        Xv_new = jnp.where(hit, moved[:, 0], Xv_upd)
        Xv_new = jnp.where(vids == e_same, theta, Xv_new)
        w_new = jnp.where(hit, moved[:, 1], w)
        w_new = jnp.where(vids == e_same, m_enter, w_new)

        # --- parent update: reverse the segment, hang e_same off e_other --
        child_on_path = moved[:, 2].astype(jnp.int32)
        parent_new = jnp.where(seg & hit, child_on_path, parent)
        parent_new = jnp.where(vids == e_same, e_other, parent_new)

        # --- dense basis mask (pricing mask) -------------------------------
        p_cl = jnp.sum(jnp.where(vids == cl, parent, 0))
        li = jnp.where(cl < S, cl, p_cl)
        lj = jnp.where(cl < S, p_cl - S, cl - S)
        mask_e = (iota_s[:, None] == ei) & (iota_d[None, :] == ej)
        mask_l = (iota_s[:, None] == li) & (iota_d[None, :] == lj)
        Bm_new = (Bmk | mask_e) & ~mask_l

        parent = jnp.where(done, parent, parent_new)
        Xv = jnp.where(done, Xv, Xv_new)
        w = jnp.where(done, w, w_new)
        Bmk = jnp.where(done, Bmk, Bm_new)
        return N, dep_next, parent, pot, w, Xv, Bmk, \
            it + (~done).astype(jnp.int32), done

    def outer_body(state):
        N, dep, parent, pot, w, Xv, Bmk, it, _ = state
        # exact potential refresh from the (exactly re-keyed) tree costs
        _, _, pot = _chain(parent, w, K, dtype)
        u, v = pot[:S], pot[S:]
        delta = jnp.where(Bmk, jnp.asarray(0.0, dtype),
                          M - u[:, None] - v[None, :])
        done = jnp.min(delta) >= -tol

        def run_chunk(st):
            return jax.lax.while_loop(
                lambda s_: (~s_[-1]) & (s_[-2] < it + refresh)
                           & (s_[-2] < max_pivots),
                pivot_body, st)

        state2 = (N, dep, parent, pot, w, Xv, Bmk, it, done)
        N, dep, parent, pot, w, Xv, Bmk, it2, chunk_done = run_chunk(state2)
        # chunk_done reflects drifted pricing; the NEXT outer round's
        # refreshed check decides actual optimality
        return N, dep, parent, pot, w, Xv, Bmk, it2, done

    def outer_cond(state):
        *_, it, done = state
        return (~done) & (it < max_pivots)

    dep0 = jnp.sum(N0, axis=1, dtype=jnp.int32) - 1
    state = (N0, dep0, parent0, jnp.zeros(V, dtype), w0, Xv0, Bm0,
             jnp.asarray(0, jnp.int32), jnp.asarray(False))
    N, dep, parent, pot, w, Xv, Bmk, pivots, done = jax.lax.while_loop(
        outer_cond, outer_body, state)

    # reconstruct the dense plan and basis from (parent, Xv) ONCE
    ci, cj, notroot = _tree_cells(parent, S, D)
    E_r = ((ci[:, None] == iota_s[None, :]) & notroot[:, None]
           ).astype(dtype)
    E_c = ((cj[:, None] == iota_d[None, :]) & notroot[:, None]
           ).astype(dtype)
    X_out = jax.lax.dot_general(E_r * Xv[:, None], E_c,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=dtype,
                                precision=_HI)
    Bm_out = jax.lax.dot_general(E_r, E_c, (((0,), (0,)), ((), ())),
                                 preferred_element_type=dtype,
                                 precision=_HI) > 0.5
    _, _, pot = _chain(parent, w, K, dtype)
    u, v = pot[:S], pot[S:]
    delta = jnp.where(Bm_out, 0.0, M - u[:, None] - v[None, :])
    optimal = jnp.min(delta) >= -tol
    return jnp.maximum(X_out, 0.0), Bm_out, pivots, optimal


@partial(jax.jit, static_argnames=("max_pivots", "refresh"))
def batched_transport_simplex_anc(X, Bm, M, s, d, tol: float = 1e-7,
                                  max_pivots: int = 5000,
                                  refresh: int = 128):
    """vmapped ancestor-matrix transport simplex over an instance batch."""
    return jax.vmap(
        lambda X_, B_, M_, s_, d_: transport_simplex_anc(
            X_, B_, M_, s_, d_, tol, max_pivots, refresh)
    )(X, Bm, M, s, d)
