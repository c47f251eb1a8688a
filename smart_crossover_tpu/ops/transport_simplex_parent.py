"""Parent-array batched transportation simplex on device.

Second-generation device simplex (see STATUS.md round-2 sketch and
VERDICT.md item 2).  The first implementation (ops/transport_simplex.py)
pays O(S*D * tree-diameter) per pivot: potentials and cycles are found by
dense masked propagation over the basis mask.  This one carries the basis
tree explicitly as a ``parent`` vector over the V = S + D nodes and runs
every per-pivot step as O(V log V) vectorized gathers via binary lifting —
the only O(S*D) work left per pivot is the dense reduced-cost pricing pass,
which is exactly the part the VPU/MXU is good at.

Per pivot (all jittable, no data-dependent inner while_loops):

* binary-lifting tables ``P[k][v]`` = 2^k-th ancestor         (log V gathers)
* depth + dual potentials by pointer-jumping over ``parent``  (log V gathers)
  using the bipartite alternation pot[v] = M_e(v) - pot[parent(v)]
* pricing: dense ``M - u ⊕ v`` argmin                          (one S*D pass)
* the entering arc's tree cycle WITHOUT any walk: a tree arc with child c
  lies on the x..y path iff c is an ancestor of exactly one endpoint, and
  ancestor tests for ALL nodes at once are a per-node variable-distance
  lift of the endpoint (log V gathers)
* cycle direction from depth parity (bipartite rows/cols alternate)
* ratio test: masked min over the decreasing cells             (O(V))
* tree update: vectorized path reversal — every node on the reversed
  segment gets its on-path child as new parent, again via lifting.

Replaces the capability the reference buys from vendor network simplex
(reference net_manager.py:211-222) for the OT/bipartite case; the mask
implementation stays as the correctness oracle (tests cross-check them).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _num_levels(V: int) -> int:
    K = 1
    while (1 << K) < V:
        K += 1
    return K


def build_parent_from_mask(Bm, max_rounds: int | None = None):
    """Root the basis-tree mask at node 0 (row 0) as a parent vector.

    Nodes 0..S-1 are rows (suppliers), S..S+D-1 are columns.  BFS-style
    masked propagation, O(diameter) rounds — run ONCE per solve, not per
    pivot.  Returns parent (V,) int32 with parent[root] == root.
    """
    S, D = Bm.shape
    V = S + D
    if max_rounds is None:
        max_rounds = V + 2

    def body(state):
        parent, arow, acol, it = state
        # unassigned columns adjacent (in the tree) to an assigned row:
        # in a tree there is exactly one such row per newly reached column.
        reach_c = Bm & arow[:, None] & ~acol[None, :]
        hit_c = jnp.any(reach_c, axis=0)
        pi_c = jnp.argmax(reach_c, axis=0).astype(jnp.int32)  # the one row
        parent = parent.at[S:].set(jnp.where(hit_c, pi_c, parent[S:]))
        acol = acol | hit_c
        # unassigned rows adjacent to an assigned column
        reach_r = Bm & acol[None, :] & ~arow[:, None]
        hit_r = jnp.any(reach_r, axis=1)
        pj_r = (jnp.argmax(reach_r, axis=1) + S).astype(jnp.int32)
        parent = parent.at[:S].set(jnp.where(hit_r, pj_r, parent[:S]))
        arow = arow | hit_r
        return parent, arow, acol, it + 1

    def cond(state):
        _, arow, acol, it = state
        return ~(jnp.all(arow) & jnp.all(acol)) & (it < max_rounds)

    parent0 = jnp.zeros(V, jnp.int32)
    arow0 = jnp.zeros(S, bool).at[0].set(True)
    acol0 = jnp.zeros(D, bool)
    parent, *_ = jax.lax.while_loop(
        cond, body, (parent0, arow0, acol0, jnp.asarray(0)))
    return parent


def _lift_tables(parent, K):
    """P with P[k][v] = 2^k-th ancestor of v (saturating at the root)."""
    tabs = [parent]
    p = parent
    for _ in range(K - 1):
        p = p[p]
        tabs.append(p)
    return tabs


def _depth(parent, K, tabs=None):
    V = parent.shape[0]
    dep = jnp.where(parent == jnp.arange(V), 0, 1).astype(jnp.int32)
    if tabs is not None:
        # reuse the lifting tables: the doubling recursion's round-k
        # pointer IS tabs[k] (the 2^k-th ancestor), so no ptr rebuild
        for tab in tabs:
            dep = dep + dep[tab]
        return dep
    ptr = parent
    for _ in range(K):
        dep = dep + dep[ptr]
        ptr = ptr[ptr]
    return dep


def _potentials(parent, M, K, tabs=None):
    """pot[v]: u_i for row nodes, v_j for column nodes; pot[root] = 0.

    Bipartite tree duals satisfy pot[v] = M_e(v) - pot[parent(v)] on every
    tree arc, independent of which side v is on; pointer-jumping with the
    (acc, sgn) composition closes the recursion in log V rounds.
    """
    S, D = M.shape
    V = S + D
    vids = jnp.arange(V)
    is_row = vids < S
    par = parent
    ci = jnp.where(is_row, vids, par)            # cell row index
    cj = jnp.where(is_row, par - S, vids - S)    # cell col index
    w = M[jnp.clip(ci, 0, S - 1), jnp.clip(cj, 0, D - 1)]
    w = jnp.where(par == vids, 0.0, w)           # root has no edge
    acc = w
    sgn = jnp.where(par == vids, 0.0, -1.0).astype(M.dtype)
    # NOTE: the (acc, sgn) composition needs the CHAIN ptr -> ptr[ptr]
    # interleaved with the accumulation, so lifting tables can't replace
    # the rebuild here — but we can fuse acc and sgn into one array so
    # each round is a single gather instead of two.
    both = jnp.stack([acc, sgn])                 # (2, V)
    ptr = parent
    for _ in range(K):
        g = both[:, ptr]
        both = jnp.stack([both[0] + both[1] * g[0], both[1] * g[1]])
        ptr = ptr[ptr]
    acc = both[0]
    return acc[:S], acc[S:]


def _lift_from(endpoint, k, tabs):
    """Ancestor of ``endpoint`` at per-node distances ``k`` (clamped >= 0)."""
    V = tabs[0].shape[0]
    cur = jnp.full((V,), endpoint, jnp.int32)
    kk = jnp.maximum(k, 0)
    for b, tab in enumerate(tabs):
        take = (kk >> b) & 1
        cur = jnp.where(take == 1, tab[cur], cur)
    return cur


def _lift_from2(end_a, end_b, k_a, k_b, tabs):
    """Two `_lift_from` chains fused into one (2, V) walk — halves the
    sequential op count of the per-pivot ancestor tests."""
    V = tabs[0].shape[0]
    cur = jnp.stack([jnp.full((V,), end_a, jnp.int32),
                     jnp.full((V,), end_b, jnp.int32)])
    kk = jnp.maximum(jnp.stack([k_a, k_b]), 0)
    for b, tab in enumerate(tabs):
        take = (kk >> b) & 1
        cur = jnp.where(take == 1, tab[cur], cur)
    return cur[0], cur[1]


@partial(jax.jit, static_argnames=("max_pivots",))
def transport_simplex_parent(X, Bm, M, s, d,
                             tol: float = 1e-7,
                             max_pivots: int = 5000):
    """Pivot a basic feasible transport plan to optimality (parent-array).

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
    vids = jnp.arange(V, dtype=jnp.int32)
    is_row = vids < S
    dtype = M.dtype

    parent0 = build_parent_from_mask(Bm)

    def cell_of(par):
        ci = jnp.where(is_row, vids, par)
        cj = jnp.where(is_row, par - S, vids - S)
        return jnp.clip(ci, 0, S - 1), jnp.clip(cj, 0, D - 1)

    def body(state):
        X, Bm, parent, it, _ = state
        tabs = _lift_tables(parent, K)
        dep = _depth(parent, K, tabs)
        u, v = _potentials(parent, M, K)

        # pricing (the one dense O(S*D) op)
        delta = M - u[:, None] - v[None, :]
        delta = jnp.where(Bm, jnp.asarray(0.0, dtype), delta)
        flat = jnp.argmin(delta.reshape(-1))
        dmin = delta.reshape(-1)[flat]
        done = dmin >= -tol
        ei = (flat // D).astype(jnp.int32)
        ej = (flat % D).astype(jnp.int32)
        x_end = ei                                  # row endpoint node
        y_end = (S + ej).astype(jnp.int32)          # col endpoint node

        # ancestor indicators for both endpoints, all nodes at once
        dx = dep[x_end]
        dy = dep[y_end]
        lift_x, lift_y = _lift_from2(x_end, y_end, dx - dep, dy - dep, tabs)
        anc_x = (lift_x == vids) & (dep <= dx)
        anc_y = (lift_y == vids) & (dep <= dy)
        root = parent == vids
        oncycle = (anc_x ^ anc_y) & ~root

        # bipartite alternation: the tree cell at child c changes by
        # -theta when the hop count from its endpoint is even
        par_x = (dx - dep) % 2 == 0
        par_y = (dy - dep) % 2 == 0
        sign = jnp.where(anc_x, jnp.where(par_x, -1.0, 1.0),
                         jnp.where(par_y, -1.0, 1.0)).astype(dtype)
        sign = jnp.where(oncycle, sign, 0.0)

        ci, cj = cell_of(parent)
        Xv = X[ci, cj]
        dec = oncycle & (sign < 0)
        ratios = jnp.where(dec, Xv, jnp.inf)
        theta = jnp.min(ratios)
        # leaving arc: min ratio, smallest node index tie-break
        cl = jnp.argmin(jnp.where(ratios <= theta + jnp.asarray(1e-12, dtype),
                                  vids, V).astype(jnp.int32)).astype(jnp.int32)
        li, lj = ci[cl], cj[cl]

        X_new = X.at[ci, cj].add(sign * theta)
        X_new = X_new.at[ei, ej].add(theta)
        X_new = jnp.maximum(X_new, 0.0)
        X_new = X_new.at[li, lj].set(0.0)
        Bm_new = Bm.at[ei, ej].set(True).at[li, lj].set(False)

        # tree update: reverse the path from the entering endpoint on the
        # leaving arc's side up to cl, then hang that endpoint off the
        # other endpoint through the entering arc.
        on_x_side = anc_x[cl]
        e_same = jnp.where(on_x_side, x_end, y_end)   # endpoint to re-root
        e_other = jnp.where(on_x_side, y_end, x_end)
        anc_e = jnp.where(on_x_side, anc_x, anc_y)
        de = dep[e_same]
        # on-path child of v = ancestor of e_same at depth dep[v] + 1
        child_on_path = _lift_from(e_same, de - dep - 1, tabs)
        seg = anc_e & (dep >= dep[cl])
        parent_new = jnp.where(seg, child_on_path, parent)
        parent_new = parent_new.at[e_same].set(e_other)

        X = jnp.where(done, X, X_new)
        Bm = jnp.where(done, Bm, Bm_new)
        parent = jnp.where(done, parent, parent_new)
        return X, Bm, parent, it + (~done).astype(jnp.int32), done

    def cond(state):
        _, _, _, it, done = state
        return (~done) & (it < max_pivots)

    X, Bm, parent, pivots, done = jax.lax.while_loop(
        cond, body, (jnp.asarray(X, dtype), jnp.asarray(Bm), parent0,
                     jnp.asarray(0), jnp.asarray(False)))
    u, v = _potentials(parent, M, K)
    delta = jnp.where(Bm, 0.0, M - u[:, None] - v[None, :])
    optimal = jnp.min(delta) >= -tol
    return X, Bm, pivots, optimal


@partial(jax.jit, static_argnames=("max_pivots",))
def batched_transport_simplex_parent(X, Bm, M, s, d, tol: float = 1e-7,
                                     max_pivots: int = 5000):
    """vmapped parent-array transport simplex over an instance batch."""
    return jax.vmap(
        lambda X_, B_, M_, s_, d_: transport_simplex_parent(
            X_, B_, M_, s_, d_, tol, max_pivots)
    )(X, Bm, M, s, d)
