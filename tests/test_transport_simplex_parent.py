"""Parent-array device transportation simplex (ops/transport_simplex_parent).

Cross-checked against the mask-propagation implementation (the designated
oracle) and scipy HiGHS.  Capability parity target: the vendor network
simplex the reference calls at net_manager.py:211-222.
"""
import numpy as np
import pytest

from smart_crossover_tpu.ops.mst import boruvka_bipartite_mst
from smart_crossover_tpu.ops.transport_simplex import transport_simplex
from smart_crossover_tpu.ops.transport_simplex_parent import (
    batched_transport_simplex_parent,
    build_parent_from_mask,
    transport_simplex_parent,
)
from tests.conftest import random_ot
from tests.test_transport_simplex import lp_optimum, northwest_corner_basis


def test_build_parent_from_mask_is_the_tree(rng):
    ot = random_ot(rng, 7, 9)
    _, Bm = northwest_corner_basis(ot.s, ot.d)
    parent = np.asarray(build_parent_from_mask(Bm))
    S, D = Bm.shape
    assert parent[0] == 0  # root
    # every non-root node's parent arc is a basis cell, and following
    # parents reaches the root (acyclic, connected)
    for v in range(1, S + D):
        p = parent[v]
        i, j = (v, p - S) if v < S else (p, v - S)
        assert Bm[i, j]
        seen, cur = set(), v
        while cur != 0:
            assert cur not in seen
            seen.add(cur)
            cur = parent[cur]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_parent_simplex_from_nw_corner(seed):
    rng = np.random.default_rng(seed)
    ot = random_ot(rng, int(rng.integers(4, 14)), int(rng.integers(4, 14)))
    X0, Bm0 = northwest_corner_basis(ot.s, ot.d)
    X, Bm, pivots, optimal = transport_simplex_parent(
        X0, Bm0, ot.M, ot.s, ot.d)
    assert bool(optimal)
    X = np.asarray(X)
    np.testing.assert_allclose(X.sum(1), ot.s, atol=1e-8)
    np.testing.assert_allclose(X.sum(0), ot.d, atol=1e-8)
    assert X.min() >= -1e-10
    assert float((X * ot.M).sum()) == pytest.approx(lp_optimum(ot), abs=1e-7)


def test_parent_simplex_matches_mask_oracle(rng):
    for trial in range(4):
        ot = random_ot(np.random.default_rng(200 + trial), 9, 11)
        X0, Bm0 = northwest_corner_basis(ot.s, ot.d)
        Xp, _, pv_p, opt_p = transport_simplex_parent(
            X0, Bm0, ot.M, ot.s, ot.d, 1e-9, 2000)
        Xm, _, pv_m, opt_m = transport_simplex(
            X0, Bm0, ot.M, ot.s, ot.d, 1e-9, 2000)
        assert bool(opt_p) and bool(opt_m)
        op = float((np.asarray(Xp) * ot.M).sum())
        om = float((np.asarray(Xm) * ot.M).sum())
        assert op == pytest.approx(om, abs=1e-9)
        # identical pivot rules -> identical trajectories
        assert int(pv_p) == int(pv_m)


def test_parent_simplex_degenerate_unit_supplies():
    rng = np.random.default_rng(3)
    S = D = 9
    s, d = np.ones(S), np.ones(D)
    M = rng.integers(1, 4, (S, D)).astype(float)  # heavy ties
    from smart_crossover_tpu.models import OptTransport

    ot = OptTransport(s=s, d=d, M=M)
    X0, Bm0 = northwest_corner_basis(s, d)
    X, Bm, pivots, optimal = transport_simplex_parent(
        X0, Bm0, M, s, d, max_pivots=2000)
    assert bool(optimal)
    assert float((np.asarray(X) * M).sum()) == pytest.approx(
        lp_optimum(ot), abs=1e-7)


def test_batched_parent_simplex(rng):
    B, S, D = 4, 8, 9
    Xs, Bms, Ms, ss, ds, ots = [], [], [], [], [], []
    for i in range(B):
        ot = random_ot(np.random.default_rng(300 + i), S, D)
        X0, Bm0 = northwest_corner_basis(ot.s, ot.d)
        ots.append(ot)
        Xs.append(X0)
        Bms.append(Bm0)
        Ms.append(ot.M)
        ss.append(ot.s)
        ds.append(ot.d)
    X, Bm, pivots, optimal = batched_transport_simplex_parent(
        np.stack(Xs), np.stack(Bms), np.stack(Ms), np.stack(ss),
        np.stack(ds))
    assert bool(np.all(np.asarray(optimal)))
    for i in range(B):
        got = float((np.asarray(X[i]) * ots[i].M).sum())
        assert got == pytest.approx(lp_optimum(ots[i]), abs=1e-7)


def test_exact_device_pipeline_parent_engine(rng):
    from smart_crossover_tpu.parallel.batched import batched_tnet_exact_device

    B, S, D = 3, 10, 11
    ots = [random_ot(np.random.default_rng(60 + i), S, D) for i in range(B)]
    s = np.stack([o.s for o in ots])
    d = np.stack([o.d for o in ots])
    M = np.stack([o.M for o in ots])
    X, obj, push, piv, opt, Bm = batched_tnet_exact_device(
        s, d, M, reg=0.01, sinkhorn_iters=500, engine="parent")
    assert bool(np.all(np.asarray(opt)))
    for i, o in enumerate(ots):
        assert float(obj[i]) == pytest.approx(lp_optimum(o), abs=1e-7)
        Xi = np.asarray(X[i])
        np.testing.assert_allclose(Xi.sum(1), o.s, atol=1e-7)
        np.testing.assert_allclose(Xi.sum(0), o.d, atol=1e-7)


def test_parent_engine_degenerate_integer_costs(rng):
    """Massively tied pricing/ratio tests (small-integer costs, equal
    supplies): the one-hot engine must still terminate at exact optimality
    (HiGHS oracle)."""
    import numpy as np
    from scipy.optimize import linprog

    from smart_crossover_tpu.ops.mst import boruvka_bipartite_mst
    from smart_crossover_tpu.ops.transport_simplex_parent import (
        transport_simplex_parent)
    from smart_crossover_tpu.network_methods.tree_bi import (
        identify_tree_flows)
    from smart_crossover_tpu.ops.ranking import ot_flow_indicators

    for seed in range(4):
        r = np.random.default_rng(seed)
        S, D = 12, 16
        s = np.full(S, 4.0)
        d = np.full(D, S * 4.0 / D)
        M = r.integers(0, 4, (S, D)).astype(np.float64)
        # feasible start from uniform plan indicators
        X0 = np.outer(s, d) / s.sum()
        W = np.asarray(ot_flow_indicators(X0, s, d))
        X, piv = identify_tree_flows(W, s, d)
        Bm = boruvka_bipartite_mst((np.asarray(X) > 1e-12).astype(float))
        Xo, Bmo, pivots, optimal = transport_simplex_parent(
            np.asarray(X), np.asarray(Bm), M, s, d, max_pivots=5000)
        assert bool(optimal), seed
        A_eq = np.zeros((S + D, S * D))
        for a in range(S * D):
            A_eq[a // D, a] = 1
            A_eq[S + a % D, a] = 1
        ref = linprog(M.ravel(), A_eq=A_eq,
                      b_eq=np.concatenate([s, d]),
                      bounds=[(0, None)] * (S * D), method="highs")
        obj = float(np.sum(np.asarray(Xo) * M))
        assert abs(obj - ref.fun) < 1e-7, (seed, obj, ref.fun)
