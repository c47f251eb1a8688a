"""Cached-symbolic normal-equations factorizer (solvers/ne_factor.py)."""
import numpy as np
import pytest
import scipy.sparse as sp

from smart_crossover_tpu.solvers.ne_factor import NEFactorizer


def _banded_spd(rng, m, bw):
    """Random SPD matrix with (scrambled) bandwidth bw."""
    diags = [rng.standard_normal(m - k) * 0.3 for k in range(1, bw + 1)]
    Mh = sp.diags(diags, offsets=range(1, bw + 1), shape=(m, m))
    M = Mh + Mh.T + sp.diags(np.full(m, 2.0 * bw))
    perm = rng.permutation(m)
    P = sp.csr_matrix((np.ones(m), (np.arange(m), perm)), shape=(m, m))
    return (P @ M @ P.T).tocsr()


def test_banded_mode_matches_dense(rng):
    m, bw = 300, 5
    M = _banded_spd(rng, m, bw)
    fac = NEFactorizer(M)
    assert fac.mode == "banded"
    assert fac.bw <= 3 * bw  # RCM recovers a narrow band
    for scale in (1.0, 7.5):
        Ms = (scale * M).tocsr()
        solve = fac.factor(Ms, 0.0)
        rhs = rng.standard_normal(m)
        x = solve(rhs)
        assert np.allclose(Ms @ x, rhs, atol=1e-8)
        # multi-RHS
        R = rng.standard_normal((m, 4))
        X = solve(R)
        assert np.allclose(Ms @ X, R, atol=1e-8)


def test_same_pattern_refactor(rng):
    """Second factor call with different values (same pattern) is correct
    — the scatter map is built once from the pattern."""
    m = 200
    A = sp.random(40, m, density=0.1, random_state=7, format="csr")
    A = A + sp.eye(40, m, format="csr")
    M1 = (A @ A.T).tocsr()
    fac = NEFactorizer(M1)
    d = np.random.default_rng(1).uniform(0.5, 2.0, m)
    W = A.copy()
    W.data = W.data * d[W.indices]
    M2 = (W @ A.T).tocsr()
    assert np.array_equal(M1.indices, M2.indices)  # pattern invariance
    solve = fac.factor(M2, 0.0)
    rhs = rng.standard_normal(40)
    assert np.allclose(M2 @ solve(rhs), rhs, atol=1e-8)


def test_splu_fallback_wide_band(rng):
    """A pattern RCM cannot localize must fall back to splu and still
    solve correctly."""
    m = 150
    M = sp.random(m, m, density=0.3, random_state=3)
    M = (M @ M.T + 10.0 * sp.eye(m)).tocsr()
    fac = NEFactorizer(M)
    solve = fac.factor(M, 0.0)
    rhs = rng.standard_normal(m)
    assert np.allclose(M @ solve(rhs), rhs, atol=1e-7)


def test_ipm_large_staircase_1e10(rng):
    """Mid-size staircase LP through the cached-symbolic banded path at the
    reference's 1e-10 barrier tolerance (m > _DENSE_NE_MAX_M so the
    factorizer is actually exercised).

    Optimality is certified from the KKT system directly — a complete
    proof at f64, no oracle needed.  (A HiGHS cross-check was measured at
    412 s on this instance vs 5.5 s for the in-house IPM; see BENCH.md.)
    """
    from smart_crossover_tpu.data.lp_gen import staircase_lp
    from smart_crossover_tpu.solvers.ipm import ipm_solve

    lp = staircase_lp(periods=20, rows_per_period=260, vars_per_period=800,
                      frac_free=0.002, seed=3)
    A = lp.get_standard_A().tocsr()
    c = lp.get_standard_c()
    l, u = lp.get_standard_bounds()
    assert A.shape[0] > 4096
    res = ipm_solve(A, lp.b, c, l, u, tol=1e-10, max_iter=60)
    assert res.status == "OPTIMAL"
    x, y, zl, zu = res.x, res.y, res.zl, res.zu
    # primal feasibility
    assert np.linalg.norm(A @ x - lp.b) <= 1e-9 * (1 + np.linalg.norm(lp.b))
    assert (x >= np.where(np.isfinite(l), l, -np.inf) - 1e-9).all()
    assert (x <= np.where(np.isfinite(u), u, np.inf) + 1e-9).all()
    # dual feasibility: c - A'y - zl + zu = 0, zl, zu >= 0
    rd = c - A.T @ y - zl + zu
    assert np.linalg.norm(rd) <= 1e-9 * (1 + np.linalg.norm(c))
    assert zl.min() >= -1e-12 and zu.min() >= -1e-12
    # duality gap
    has_l, has_u = np.isfinite(l), np.isfinite(u)
    dobj = lp.b @ y + l[has_l] @ zl[has_l] - u[has_u] @ zu[has_u]
    assert abs(res.obj_val - dobj) <= 1e-9 * (1 + abs(res.obj_val))
