import numpy as np
import pytest
from scipy.optimize import linprog

from smart_crossover_tpu.solvers.ipm_batched import ipm_dense, ipm_dense_batched


def make_lp(rng, m=6, n=16):
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.2, 0.8, n)
    c = rng.standard_normal(n)
    return A, b, c, np.zeros(n), np.ones(n)


def test_ipm_dense_matches_highs(rng):
    A, b, c, l, u = make_lp(rng)
    res = ipm_dense(A, b, c, l, u, tol=1e-9, max_iters=60)
    assert bool(res["converged"])
    ref = linprog(c, A_eq=A, b_eq=b, bounds=[(0, 1)] * 16, method="highs")
    assert float(res["obj_val"]) == pytest.approx(ref.fun, abs=1e-6)
    x = np.asarray(res["x"])
    assert np.all(x >= -1e-9) and np.all(x <= 1 + 1e-9)
    np.testing.assert_allclose(A @ x, b, atol=1e-7)


def test_ipm_dense_one_sided_bounds(rng):
    m, n = 5, 12
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.2, 0.8, n)
    c = A.T @ rng.standard_normal(m) + np.abs(rng.standard_normal(n)) + 0.1
    l, u = np.zeros(n), np.full(n, np.inf)
    res = ipm_dense(A, b, c, l, u, tol=1e-8, max_iters=60)
    assert bool(res["converged"])
    ref = linprog(c, A_eq=A, b_eq=b, bounds=[(0, None)] * n, method="highs")
    assert float(res["obj_val"]) == pytest.approx(ref.fun, abs=1e-5)


def test_ipm_dense_batched(rng):
    B, m, n = 5, 6, 16
    As = np.stack([make_lp(rng, m, n)[0] for _ in range(B)])
    xs = rng.uniform(0.2, 0.8, (B, n))
    bs = np.einsum("bmn,bn->bm", As, xs)
    cs = rng.standard_normal((B, n))
    ls = np.zeros((B, n))
    us = np.ones((B, n))
    res = ipm_dense_batched(As, bs, cs, ls, us, tol=1e-9, max_iters=60)
    assert bool(np.all(np.asarray(res["converged"])))
    for i in range(B):
        ref = linprog(cs[i], A_eq=As[i], b_eq=bs[i], bounds=[(0, 1)] * n,
                      method="highs")
        assert float(res["obj_val"][i]) == pytest.approx(ref.fun, abs=1e-6)
