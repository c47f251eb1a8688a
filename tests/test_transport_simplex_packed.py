"""Bit-packed ancestor-matrix transportation simplex vs the oracles."""
import numpy as np
import pytest

from smart_crossover_tpu.ops.transport_simplex_anc import (
    build_ancestor_matrix,
)
from smart_crossover_tpu.ops.transport_simplex_packed import (
    batched_transport_simplex_packed,
    pack_bool_rows,
    transport_simplex_packed,
    unpack_row,
)
from smart_crossover_tpu.ops.transport_simplex_parent import (
    build_parent_from_mask,
)


def _rand_ot(rng, S, D):
    s = rng.uniform(0.5, 2.0, S)
    d = rng.uniform(0.5, 2.0, D)
    d *= s.sum() / d.sum()
    M = rng.uniform(0, 5, (S, D))
    return s, d, M


def _nw_corner(s, d):
    """Northwest-corner basic feasible start (plan + tree mask)."""
    S, D = len(s), len(d)
    X = np.zeros((S, D))
    Bm = np.zeros((S, D), dtype=bool)
    ss, dd = s.copy(), d.copy()
    i = j = 0
    while True:
        Bm[i, j] = True
        t = min(ss[i], dd[j])
        X[i, j] = t
        ss[i] -= t
        dd[j] -= t
        if i == S - 1 and j == D - 1:
            break
        if ss[i] <= dd[j] and i < S - 1:
            i += 1
        else:
            j += 1
    return X, Bm


def _highs_opt(s, d, M):
    from scipy.optimize import linprog
    S, D = M.shape
    A = np.zeros((S + D, S * D))
    for i in range(S):
        A[i, i * D:(i + 1) * D] = 1.0
    for j in range(D):
        A[S + j, j::D] = 1.0
    r = linprog(M.ravel(), A_eq=A, b_eq=np.concatenate([s, d]),
                bounds=[(0, None)] * (S * D), method="highs")
    assert r.status == 0
    return r.fun


def test_pack_unpack_roundtrip_and_paths(rng):
    s, d, M = _rand_ot(rng, 6, 9)
    _, Bm = _nw_corner(s, d)
    parent = np.asarray(build_parent_from_mask(Bm))
    N = np.asarray(build_ancestor_matrix(parent))
    V = len(parent)
    import jax.numpy as jnp
    W = (V + 31) // 32
    P = np.asarray(pack_bool_rows(jnp.asarray(N), W))
    for u in range(V):
        assert np.array_equal(np.asarray(unpack_row(jnp.asarray(P[u]), V)),
                              N[u])
    for u in range(V):
        path = {u}
        v = u
        while parent[v] != v:
            v = parent[v]
            path.add(int(v))
        assert set(np.flatnonzero(N[u])) == path


@pytest.mark.parametrize("S,D", [(6, 9), (13, 8), (16, 16)])
def test_packed_engine_matches_highs_from_nw_corner(rng, S, D):
    for trial in range(3):
        s, d, M = _rand_ot(rng, S, D)
        X0, Bm0 = _nw_corner(s, d)
        X, Bm, piv, opt = transport_simplex_packed(
            X0, Bm0, M, s, d, max_pivots=2000)
        assert bool(opt), f"trial {trial}: not optimal after {piv} pivots"
        X = np.asarray(X, dtype=np.float64)
        ref = _highs_opt(s, d, M)
        assert float((X * M).sum()) == pytest.approx(ref, abs=1e-6)
        np.testing.assert_allclose(X.sum(1), s, atol=1e-6)
        np.testing.assert_allclose(X.sum(0), d, atol=1e-6)
        assert np.asarray(Bm).sum() == S + D - 1


def test_packed_engine_matches_parent_engine(rng):
    """Same pivots/optimum as the parent-array engine from the same start."""
    from smart_crossover_tpu.ops.transport_simplex_parent import (
        transport_simplex_parent,
    )

    s, d, M = _rand_ot(rng, 12, 15)
    X0, Bm0 = _nw_corner(s, d)
    Xa, Ba, pa, oa = transport_simplex_packed(X0, Bm0, M, s, d)
    Xp, Bp, pp, op = transport_simplex_parent(X0, Bm0, M, s, d)
    assert bool(oa) and bool(op)
    np.testing.assert_allclose(float((np.asarray(Xa) * M).sum()),
                               float((np.asarray(Xp) * M).sum()),
                               rtol=1e-6)


def test_packed_engine_batched_and_certified(rng):
    from smart_crossover_tpu.network_methods.certify import (
        certify_ot_basis_batch,
    )

    B, S, D = 4, 10, 12
    packs = [_rand_ot(rng, S, D) for _ in range(B)]
    s = np.stack([p[0] for p in packs])
    d = np.stack([p[1] for p in packs])
    M = np.stack([p[2] for p in packs])
    starts = [_nw_corner(s[i], d[i]) for i in range(B)]
    X0 = np.stack([st[0] for st in starts])
    Bm0 = np.stack([st[1] for st in starts])
    X, Bm, piv, opt = batched_transport_simplex_packed(X0, Bm0, M, s, d)
    assert bool(np.all(np.asarray(opt)))
    certs = certify_ot_basis_batch(np.asarray(Bm), s, d, M)
    for i, c in enumerate(certs):
        assert c.ok, c.reason
        assert c.obj_val == pytest.approx(_highs_opt(s[i], d[i], M[i]),
                                          abs=1e-7)


def test_packed_engine_degenerate_ties(rng):
    """Integer-valued supplies/demands force degenerate pivots."""
    S, D = 8, 8
    s = np.ones(S) * 2.0
    d = np.ones(D) * 2.0
    M = rng.integers(1, 6, (S, D)).astype(np.float64)
    X0, Bm0 = _nw_corner(s, d)
    X, Bm, piv, opt = transport_simplex_packed(X0, Bm0, M, s, d,
                                            max_pivots=3000)
    assert bool(opt)
    ref = _highs_opt(s, d, M)
    assert float((np.asarray(X, np.float64) * M).sum()) == pytest.approx(
        ref, abs=1e-6)
