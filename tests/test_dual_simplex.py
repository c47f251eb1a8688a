import numpy as np
import pytest
from scipy.optimize import linprog

from smart_crossover_tpu.solvers.simplex import dual_simplex, primal_simplex


def make_lp(rng, m=8, n=20):
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.2, 0.8, n)
    c = rng.standard_normal(n)
    return A, b, c, np.zeros(n), np.ones(n)


def test_dual_simplex_resolve_after_rhs_change(rng):
    A, b, c, l, u = make_lp(rng)
    base = primal_simplex(A, b, c, l, u)
    assert base.status == "OPTIMAL"
    # perturb the RHS: the old basis stays dual feasible but turns primal
    # infeasible — the dual simplex's home turf
    b2 = b + rng.uniform(-0.05, 0.05, b.size)
    res = dual_simplex(A, b2, c, l, u, vstatus=base.vstatus)
    ref = linprog(c, A_eq=A, b_eq=b2, bounds=[(0, 1)] * 20, method="highs")
    if ref.status == 0:
        assert res.status == "OPTIMAL"
        assert res.obj_val == pytest.approx(ref.fun, abs=1e-7)
        np.testing.assert_allclose(A @ res.x, b2, atol=1e-8)
    else:
        assert res.status == "INFEASIBLE"


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_dual_simplex_matches_highs(seed):
    rng = np.random.default_rng(seed)
    A, b, c, l, u = make_lp(rng, m=6, n=14)
    base = primal_simplex(A, b, c, l, u)
    for shift in [0.02, -0.03]:
        b2 = b + shift
        res = dual_simplex(A, b2, c, l, u, vstatus=base.vstatus)
        ref = linprog(c, A_eq=A, b_eq=b2, bounds=[(0, 1)] * 14,
                      method="highs")
        if ref.status == 0:
            assert res.status == "OPTIMAL"
            assert res.obj_val == pytest.approx(ref.fun, abs=1e-7)


def test_dual_simplex_falls_back_when_not_dual_feasible(rng):
    A, b, c, l, u = make_lp(rng)
    # garbage warm start: all at lower (generally not dual feasible)
    vst = np.full(20, -1, dtype=np.int8)
    res = dual_simplex(A, b, c, l, u, vstatus=vst)
    ref = linprog(c, A_eq=A, b_eq=b, bounds=[(0, 1)] * 20, method="highs")
    assert res.status == "OPTIMAL"
    assert res.obj_val == pytest.approx(ref.fun, abs=1e-7)


def test_dual_simplex_from_optimal_basis_no_pivots(rng):
    A, b, c, l, u = make_lp(rng)
    base = primal_simplex(A, b, c, l, u)
    res = dual_simplex(A, b, c, l, u, vstatus=base.vstatus)
    assert res.status == "OPTIMAL"
    assert res.iter_count == 0
    assert res.obj_val == pytest.approx(base.obj_val, abs=1e-9)


def test_dual_simplex_bound_flip_case(rng):
    # narrow boxes force entering variables to hit their opposite bound
    m, n = 5, 12
    A = rng.standard_normal((m, n))
    l = np.zeros(n)
    u = np.full(n, 0.15)  # narrow
    b = A @ rng.uniform(0.02, 0.13, n)
    c = rng.standard_normal(n)
    base = primal_simplex(A, b, c, l, u)
    assert base.status == "OPTIMAL"
    b2 = b + rng.uniform(-0.08, 0.08, m)
    res = dual_simplex(A, b2, c, l, u, vstatus=base.vstatus)
    ref = linprog(c, A_eq=A, b_eq=b2, bounds=[(0, 0.15)] * n, method="highs")
    if ref.status == 0:
        assert res.status == "OPTIMAL"
        assert res.obj_val == pytest.approx(ref.fun, abs=1e-7)
        assert np.all(res.x >= -1e-9) and np.all(res.x <= 0.15 + 1e-9)
    else:
        assert res.status == "INFEASIBLE"
