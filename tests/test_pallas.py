import numpy as np
import pytest

from smart_crossover_tpu.ops.sinkhorn_pallas import (
    pallas_shapes_ok,
    sinkhorn_plan_pallas,
)
from smart_crossover_tpu.solvers.sinkhorn import (
    plan_from_potentials,
    sinkhorn_potentials,
)


def make_batch(rng, B=3, S=16, D=16, dtype=np.float64):
    s = rng.uniform(0.5, 2.0, (B, S)).astype(dtype)
    d = rng.uniform(0.5, 2.0, (B, D)).astype(dtype)
    d *= (s.sum(axis=1) / d.sum(axis=1))[:, None]
    M = rng.uniform(0.0, 5.0, (B, S, D)).astype(dtype)
    return s, d, M


def test_pallas_sinkhorn_matches_xla(rng):
    s, d, M = make_batch(rng)
    reg = 0.5
    # interpret mode on CPU
    plans = np.asarray(sinkhorn_plan_pallas(s, d, M, reg, num_iters=100))
    for b in range(s.shape[0]):
        f, g = sinkhorn_potentials(s[b], d[b], M[b], reg, num_iters=100)
        want = np.asarray(plan_from_potentials(f, g, M[b], reg))
        np.testing.assert_allclose(plans[b], want, rtol=1e-10, atol=1e-12)


def test_pallas_sinkhorn_marginals(rng):
    s, d, M = make_batch(rng, B=2, S=8, D=24)
    plans = np.asarray(sinkhorn_plan_pallas(s, d, M, 0.3, num_iters=800))
    # after the g-update the column marginals are exact
    np.testing.assert_allclose(plans.sum(axis=1), d, atol=1e-10)
    np.testing.assert_allclose(plans.sum(axis=2), s, atol=1e-3)


def test_pallas_shape_gate():
    assert pallas_shapes_ok(256, 256)
    assert not pallas_shapes_ok(100, 256)     # sublane misaligned
    assert not pallas_shapes_ok(256, 100)     # lane misaligned
    assert not pallas_shapes_ok(2048, 2048)   # VMEM budget


# ------------------------------------------------------------ PDHG chunk

def test_pallas_pdhg_chunk_matches_scan(rng):
    """The VMEM-resident PDHG chunk (interpret mode here) must reproduce
    the XLA scan trajectory exactly: same adaptive-step math."""
    import jax
    import jax.numpy as jnp

    from smart_crossover_tpu.ops.pdhg_pallas import get_pdhg_chunk_fn

    m, n = 16, 128
    A = jnp.asarray(rng.standard_normal((m, n)))
    b = jnp.asarray(rng.standard_normal(m))
    c = jnp.asarray(rng.standard_normal(n))
    l = jnp.zeros(n)
    u = jnp.ones(n)
    eq = jnp.asarray(rng.random(m) < 0.5)
    x = jnp.full(n, 0.5)
    y = jnp.zeros(m)
    Ax = A @ x
    xs = jnp.zeros(n)
    ys = jnp.zeros(m)
    opnorm = jnp.asarray(20.0)
    wsum = jnp.asarray(0.0)
    eta = 0.9 / opnorm
    omega = jnp.asarray(1.0)
    chunk = 32

    def one_iter(carry, _):
        x, y, Ax, xs, ys, wsum, eta, omega, k = carry
        tau = eta / omega
        sigma = eta * omega
        x_c = jnp.clip(x - tau * (c - A.T @ y), l, u)
        Ax_c = A @ x_c
        y_t = y + sigma * (b - (2.0 * Ax_c - Ax))
        y_c = jnp.where(eq, y_t, jnp.minimum(y_t, 0.0))
        dx = x_c - x
        dy = y_c - y
        curv = jnp.abs(dy @ (Ax_c - Ax))
        nz = omega * (dx @ dx) + (dy @ dy) / omega
        eta_bar = jnp.where(curv > 0, nz / (2.0 * curv), 1e10 / opnorm)
        accept = eta <= eta_bar
        k1 = (k + 2).astype(jnp.float64)   # PDLP schedule index, 0-based k
        eta_next = jnp.minimum((1.0 - k1 ** -0.3) * eta_bar,
                               (1.0 + k1 ** -0.6) * eta)
        eta_next = jnp.clip(eta_next, 1e-10 / opnorm, 1e10 / opnorm)
        x = jnp.where(accept, x_c, x)
        y = jnp.where(accept, y_c, y)
        Ax = jnp.where(accept, Ax_c, Ax)
        w = jnp.where(accept, eta, 0.0)
        return (x, y, Ax, xs + w * x, ys + w * y, wsum + w,
                eta_next, omega, k + 1), None

    (xr, yr, Axr, xsr, ysr, wsumr, etar, _, _), _ = jax.lax.scan(
        one_iter, (x, y, Ax, xs, ys, wsum, eta, omega, 0),
        None, length=chunk)

    fn = get_pdhg_chunk_fn(m, n, str(A.dtype), chunk, interpret=True)
    xp, yp, Axp, xsp, ysp, wsump, etap = fn(
        A, b, c, l, u, eq, x, y, Ax, xs, ys, wsum, eta, omega, 0, opnorm)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xr),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xsp), np.asarray(xsr),
                               rtol=1e-12, atol=1e-12)
    assert float(wsump) == pytest.approx(float(wsumr), rel=1e-12)
    assert float(etap) == pytest.approx(float(etar), rel=1e-9)


def test_pallas_pdhg_solve_end_to_end(rng):
    """pdhg_solve(use_pallas=True) (interpret mode, padded shapes) matches
    HiGHS on a small dense LP, including '<' rows."""
    from scipy.optimize import linprog

    from smart_crossover_tpu.solvers.pdhg import pdhg_solve

    m, n = 12, 50   # deliberately unaligned: exercises pad_lp_for_pallas
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.1, 0.9, n)
    sense = np.array(["="] * 6 + ["<"] * 6)
    b = b + np.where(sense == "<", 0.3, 0.0)
    c = rng.standard_normal(n)
    res = pdhg_solve(A, b, c, np.zeros(n), np.ones(n), sense=sense,
                     tol=1e-8, max_iters=20000, use_pallas=True)
    ref = linprog(c, A_eq=A[:6], b_eq=b[:6], A_ub=A[6:], b_ub=b[6:],
                  bounds=[(0, 1)] * n, method="highs")
    assert res.status == "OPTIMAL"
    assert res.obj_val == pytest.approx(ref.fun, abs=1e-6)


def test_pdhg_pallas_gate():
    from smart_crossover_tpu.ops.pdhg_pallas import pdhg_pallas_ok

    assert pdhg_pallas_ok(512, 2048)
    assert pdhg_pallas_ok(768, 2048)
    assert not pdhg_pallas_ok(1024, 2048)   # 8 MB A: measured VMEM OOM
    assert not pdhg_pallas_ok(100, 2048)    # sublane misaligned
    assert not pdhg_pallas_ok(512, 100)     # lane misaligned


def test_halpern_pallas_chunk_matches_xla(rng):
    """use_pallas halpern chunks (interpret mode on CPU) must reach the
    same optimum as the XLA halpern core."""
    from scipy.optimize import linprog

    from smart_crossover_tpu.solvers.pdhg import pdhg_solve

    m, n = 16, 128
    A = rng.standard_normal((m, n)) / np.sqrt(m)
    b = A @ rng.uniform(0.2, 0.8, n)
    c = A.T @ rng.standard_normal(m) + np.abs(rng.standard_normal(n)) + 0.05
    l = np.zeros(n)
    u = np.full(n, 2.0)
    ref = linprog(c, A_eq=A, b_eq=b, bounds=[(0, 2)] * n, method="highs")
    r_xla = pdhg_solve(A, b, c, l, u, tol=1e-7, max_iters=30_000,
                       mode="halpern", use_pallas=False, polish=False)
    r_pls = pdhg_solve(A, b, c, l, u, tol=1e-7, max_iters=30_000,
                       mode="halpern", use_pallas=True, polish=False)
    assert r_xla.status == "OPTIMAL" and r_pls.status == "OPTIMAL"
    assert abs(r_pls.obj_val - ref.fun) < 1e-5 * (1 + abs(ref.fun))
    assert abs(r_xla.obj_val - r_pls.obj_val) < 1e-6 * (1 + abs(ref.fun))
