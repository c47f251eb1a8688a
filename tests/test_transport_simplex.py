import numpy as np
import pytest
from scipy.optimize import linprog

from smart_crossover_tpu.ops.mst import boruvka_bipartite_mst
from smart_crossover_tpu.ops.transport_simplex import (
    batched_transport_simplex,
    transport_simplex,
    tree_potentials,
)
from smart_crossover_tpu.ops.tree import bipartite_tree_solve, push_to_bfs
from tests.conftest import random_ot


def northwest_corner_basis(s, d):
    """Classic NW-corner starting BFS (host helper for tests)."""
    S, D = s.size, d.size
    X = np.zeros((S, D))
    Bm = np.zeros((S, D), dtype=bool)
    rs = s.copy()
    rd = d.copy()
    i = j = 0
    while i < S and j < D:
        t = min(rs[i], rd[j])
        X[i, j] = t
        Bm[i, j] = True
        rs[i] -= t
        rd[j] -= t
        if i == S - 1 and j == D - 1:
            break
        if rs[i] <= rd[j] and i < S - 1:
            i += 1
        elif j < D - 1:
            j += 1
        else:
            i += 1
    return X, Bm


def lp_optimum(ot):
    mcf = ot.to_MCF()
    ref = linprog(mcf.c, A_eq=mcf.A.toarray(), b_eq=mcf.b,
                  bounds=[(0, None)] * mcf.n, method="highs")
    assert ref.status == 0
    return ref.fun


def test_tree_potentials_consistency(rng):
    ot = random_ot(rng, 5, 6)
    X, Bm = northwest_corner_basis(ot.s, ot.d)
    assert Bm.sum() == 5 + 6 - 1
    u, v = tree_potentials(Bm, ot.M)
    uu, vv = np.asarray(u), np.asarray(v)
    # u_i + v_j = M_ij on every basis cell
    ii, jj = np.where(Bm)
    np.testing.assert_allclose(uu[ii] + vv[jj], ot.M[ii, jj], atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_transport_simplex_from_nw_corner(seed):
    rng = np.random.default_rng(seed)
    ot = random_ot(rng, int(rng.integers(4, 12)), int(rng.integers(4, 12)))
    X0, Bm0 = northwest_corner_basis(ot.s, ot.d)
    X, Bm, pivots, optimal = transport_simplex(X0, Bm0, ot.M, ot.s, ot.d)
    assert bool(optimal)
    X = np.asarray(X)
    np.testing.assert_allclose(X.sum(1), ot.s, atol=1e-8)
    np.testing.assert_allclose(X.sum(0), ot.d, atol=1e-8)
    assert X.min() >= -1e-10
    assert float((X * ot.M).sum()) == pytest.approx(lp_optimum(ot), abs=1e-7)


def test_transport_simplex_warm_from_tnet_tree(rng):
    # the full device path: MST tree -> tree solve -> push -> complete basis
    # -> device simplex
    ot = random_ot(rng, 10, 12)
    from smart_crossover_tpu.ops.ranking import ot_flow_indicators
    from smart_crossover_tpu.solvers.sinkhorn import sinkhorn

    x = sinkhorn(ot, reg=0.01, num_iters=1000).reshape(10, 12)
    W = np.asarray(ot_flow_indicators(x, ot.s, ot.d))
    mask = np.asarray(boruvka_bipartite_mst(W))
    Xt = np.asarray(bipartite_tree_solve(mask, ot.s, ot.d))
    Xf, _ = push_to_bfs(Xt)
    Xf = np.asarray(Xf)
    # complete the (possibly degenerate) support to a spanning tree
    support = (Xf > 1e-12).astype(np.float64)
    Bm = np.asarray(boruvka_bipartite_mst(support))
    assert Bm.sum() == 10 + 12 - 1
    X, Bm2, pivots, optimal = transport_simplex(Xf, Bm, ot.M, ot.s, ot.d)
    assert bool(optimal)
    assert float((np.asarray(X) * ot.M).sum()) == pytest.approx(
        lp_optimum(ot), abs=1e-7)
    # warm start pays: pivot count well below a cold NW start
    X0, Bm0 = northwest_corner_basis(ot.s, ot.d)
    _, _, cold_pivots, _ = transport_simplex(X0, Bm0, ot.M, ot.s, ot.d)
    assert int(pivots) <= int(cold_pivots)


def test_batched_transport_simplex(rng):
    B, S, D = 4, 8, 9
    Xs, Bms, Ms, ss, ds = [], [], [], [], []
    ots = []
    for i in range(B):
        ot = random_ot(np.random.default_rng(100 + i), S, D)
        X0, Bm0 = northwest_corner_basis(ot.s, ot.d)
        ots.append(ot)
        Xs.append(X0)
        Bms.append(Bm0)
        Ms.append(ot.M)
        ss.append(ot.s)
        ds.append(ot.d)
    X, Bm, pivots, optimal = batched_transport_simplex(
        np.stack(Xs), np.stack(Bms), np.stack(Ms), np.stack(ss),
        np.stack(ds))
    assert bool(np.all(np.asarray(optimal)))
    for i in range(B):
        got = float((np.asarray(X[i]) * ots[i].M).sum())
        assert got == pytest.approx(lp_optimum(ots[i]), abs=1e-7)


def test_batched_tnet_exact_device_pipeline(rng):
    from smart_crossover_tpu.parallel.batched import batched_tnet_exact_device

    B, S, D = 3, 10, 11
    ots = [random_ot(np.random.default_rng(50 + i), S, D) for i in range(B)]
    s = np.stack([o.s for o in ots])
    d = np.stack([o.d for o in ots])
    M = np.stack([o.M for o in ots])
    X, obj, push, piv, opt, Bm = batched_tnet_exact_device(
        s, d, M, reg=0.01, sinkhorn_iters=500)
    assert bool(np.all(np.asarray(opt)))
    for i, o in enumerate(ots):
        assert float(obj[i]) == pytest.approx(lp_optimum(o), abs=1e-7)
        Xi = np.asarray(X[i])
        np.testing.assert_allclose(Xi.sum(1), o.s, atol=1e-7)
        np.testing.assert_allclose(Xi.sum(0), o.d, atol=1e-7)


def test_transport_simplex_degenerate_integer_costs():
    rng = np.random.default_rng(3)
    S = D = 7
    s = np.ones(S)
    d = np.ones(D)
    M = rng.integers(1, 4, (S, D)).astype(float)  # heavy ties
    from smart_crossover_tpu.models import OptTransport

    ot = OptTransport(s=s, d=d, M=M)
    X0, Bm0 = northwest_corner_basis(s, d)
    X, Bm, pivots, optimal = transport_simplex(X0, Bm0, M, s, d,
                                               max_pivots=2000)
    assert bool(optimal)
    assert float((np.asarray(X) * M).sum()) == pytest.approx(
        lp_optimum(ot), abs=1e-7)
