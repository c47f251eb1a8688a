import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import linprog

from smart_crossover_tpu.solvers.simplex import (
    ST_BASIC,
    ST_LOWER,
    primal_simplex,
)


def check_vs_highs(A, b, c, l, u, res, tol=1e-7):
    bounds = [(lo if np.isfinite(lo) else None, up if np.isfinite(up) else None)
              for lo, up in zip(l, u)]
    ref = linprog(c, A_eq=A, b_eq=b, bounds=bounds, method="highs")
    if ref.status == 2:
        assert res.status == "INFEASIBLE"
        return ref
    if ref.status == 3:
        assert res.status == "UNBOUNDED"
        return ref
    assert ref.status == 0
    assert res.status == "OPTIMAL", res.status
    assert res.obj_val == pytest.approx(ref.fun, abs=tol, rel=1e-9)
    np.testing.assert_allclose(A @ res.x, b, atol=1e-7)
    assert np.all(res.x >= l - 1e-8) and np.all(res.x <= u + 1e-8)
    return ref


def test_simple_bounded_lp():
    # min -x1 - 2 x2 s.t. x1 + x2 = 1.5, 0<=x<=1
    A = np.array([[1.0, 1.0]])
    res = primal_simplex(A, [1.5], [-1.0, -2.0], [0.0, 0.0], [1.0, 1.0])
    check_vs_highs(A, [1.5], [-1.0, -2.0], np.zeros(2), np.ones(2), res)
    np.testing.assert_allclose(res.x, [0.5, 1.0], atol=1e-9)


def test_free_variable_lp():
    # min x1 + x2, x1 free: x1 + x2 = 0, x2 in [0, 2]; optimum x2=2? no:
    # min x1 + x2 with x1 = -x2 -> obj = 0 for any x2 -> multiple optima
    A = np.array([[1.0, 1.0]])
    res = primal_simplex(A, [0.0], [1.0, 1.0],
                         [-np.inf, 0.0], [np.inf, 2.0])
    check_vs_highs(A, [0.0], [1.0, 1.0],
                   np.array([-np.inf, 0.0]), np.array([np.inf, 2.0]), res)


def test_unbounded_lp():
    A = np.array([[1.0, -1.0]])
    res = primal_simplex(A, [0.0], [-1.0, 0.0],
                         [0.0, 0.0], [np.inf, np.inf])
    assert res.status == "UNBOUNDED"


def test_infeasible_lp():
    # x1 + x2 = 5 with x in [0,1]^2
    A = np.array([[1.0, 1.0]])
    res = primal_simplex(A, [5.0], [1.0, 1.0], [0.0, 0.0], [1.0, 1.0])
    assert res.status == "INFEASIBLE"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_dense_lps(seed):
    rng = np.random.default_rng(seed)
    m, n = 8, 20
    A = rng.standard_normal((m, n))
    x_feas = rng.uniform(0.2, 0.8, n)
    b = A @ x_feas
    c = rng.standard_normal(n)
    l = np.zeros(n)
    u = np.ones(n)
    res = primal_simplex(A, b, c, l, u)
    check_vs_highs(A, b, c, l, u, res)


@pytest.mark.parametrize("seed", [10, 11])
def test_random_lps_with_free_and_inf_bounds(seed):
    rng = np.random.default_rng(seed)
    m, n = 6, 15
    A = rng.standard_normal((m, n))
    x_feas = rng.uniform(-0.5, 0.5, n)
    b = A @ x_feas
    c = rng.standard_normal(n) + 0.5  # bias positive to keep bounded-ish
    l = np.where(rng.uniform(size=n) < 0.3, -np.inf, -1.0)
    u = np.where(rng.uniform(size=n) < 0.3, np.inf, 2.0)
    # ensure boundedness: positive cost on unbounded-above vars, etc.
    c = np.abs(c)
    c[~np.isfinite(l)] = np.abs(c[~np.isfinite(l)])
    res = primal_simplex(A, b, c, l, u)
    check_vs_highs(A, b, c, l, u, res)


def test_warm_start_from_optimal_basis(seed=5):
    rng = np.random.default_rng(seed)
    m, n = 8, 20
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.2, 0.8, n)
    c = rng.standard_normal(n)
    l, u = np.zeros(n), np.ones(n)
    cold = primal_simplex(A, b, c, l, u)
    assert cold.status == "OPTIMAL"
    warm = primal_simplex(A, b, c, l, u, vstatus=cold.vstatus)
    assert warm.status == "OPTIMAL"
    assert warm.iter_count <= 1
    assert warm.obj_val == pytest.approx(cold.obj_val, rel=1e-10, abs=1e-10)


def test_warm_start_from_near_optimal_point(seed=7):
    # crossover-style warm start: statuses guessed from an interior point
    rng = np.random.default_rng(seed)
    m, n = 10, 30
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.2, 0.8, n)
    c = rng.standard_normal(n)
    l, u = np.zeros(n), np.ones(n)
    ref = linprog(c, A_eq=A, b_eq=b, bounds=[(0, 1)] * n, method="highs")
    assert ref.status == 0
    x_int = np.clip(ref.x + rng.uniform(-1e-3, 1e-3, n), 0, 1)
    st = np.full(n, ST_LOWER, dtype=np.int8)
    st[x_int > 0.5] = -2
    st[(x_int > 1e-4) & (x_int < 1 - 1e-4)] = ST_BASIC
    res = primal_simplex(A, b, c, l, u, vstatus=st)
    assert res.status == "OPTIMAL"
    assert res.obj_val == pytest.approx(ref.fun, rel=1e-9, abs=1e-8)


def test_sparse_input():
    A = sp.random(12, 40, density=0.3, random_state=3, format="csc")
    A = A + sp.eye(12, 40) * 2.0  # full row rank-ish
    rng = np.random.default_rng(3)
    b = np.asarray(A @ rng.uniform(0.2, 0.8, 40)).ravel()
    c = rng.standard_normal(40)
    l, u = np.zeros(40), np.ones(40)
    res = primal_simplex(A, b, c, l, u)
    check_vs_highs(A.toarray(), b, c, l, u, res)


def test_time_limit_enforced():
    rng = np.random.default_rng(0)
    m, n = 60, 240
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.2, 0.8, n)
    c = rng.standard_normal(n)
    res = primal_simplex(A, b, c, np.zeros(n), np.ones(n), time_limit=0.0)
    assert res.status == "TIME_LIMIT"


def test_devex_pricing_matches_and_saves_pivots():
    rng = np.random.default_rng(9)
    m, n = 30, 120
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.2, 0.8, n)
    c = rng.standard_normal(n)
    dz = primal_simplex(A, b, c, np.zeros(n), np.ones(n), pricing="dantzig")
    dv = primal_simplex(A, b, c, np.zeros(n), np.ones(n), pricing="devex")
    assert dz.status == dv.status == "OPTIMAL"
    assert dv.obj_val == pytest.approx(dz.obj_val, abs=1e-8)
