"""Fault-injection: corrupted warm starts must be repaired, never crash."""
import numpy as np
import pytest
from scipy.optimize import linprog

from smart_crossover_tpu.models import Basis
from smart_crossover_tpu.solvers.network_simplex import network_simplex
from smart_crossover_tpu.solvers.simplex import primal_simplex
from tests.conftest import random_ot


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_network_simplex_survives_garbage_basis(seed):
    rng = np.random.default_rng(seed)
    ot = random_ot(rng, 8, 9)
    mcf = ot.to_MCF()
    ref = linprog(mcf.c, A_eq=mcf.A.toarray(), b_eq=mcf.b,
                  bounds=[(0, None)] * mcf.n, method="highs")
    # garbage: random statuses incl. invalid codes and too many basics
    vb = rng.integers(-5, 3, mcf.n).astype(np.int32)
    cb = rng.integers(-2, 1, mcf.m).astype(np.int32)
    for native in (False, True):
        res = network_simplex(mcf, warm_basis=Basis(vb, cb),
                              use_native=native)
        assert res.status == "OPTIMAL"
        assert res.obj_val == pytest.approx(ref.fun, abs=1e-7)


@pytest.mark.parametrize("seed", [3, 4])
def test_primal_simplex_survives_garbage_statuses(seed):
    rng = np.random.default_rng(seed)
    m, n = 6, 16
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.2, 0.8, n)
    c = rng.standard_normal(n)
    ref = linprog(c, A_eq=A, b_eq=b, bounds=[(0, 1)] * n, method="highs")
    vst = rng.integers(-6, 4, n).astype(np.int8)
    res = primal_simplex(A, b, c, np.zeros(n), np.ones(n), vstatus=vst)
    assert res.status == "OPTIMAL"
    assert res.obj_val == pytest.approx(ref.fun, abs=1e-7)


def test_crossover_with_wild_interior_point(rng):
    # x far outside bounds / negative: ranking must clamp, result exact
    from smart_crossover_tpu.network_methods import network_crossover

    ot = random_ot(rng, 7, 8)
    mcf = ot.to_MCF()
    ref = linprog(mcf.c, A_eq=mcf.A.toarray(), b_eq=mcf.b,
                  bounds=[(0, None)] * mcf.n, method="highs")
    x = rng.uniform(-5, 5, ot.n)  # wild
    out = network_crossover(x=x, ot=ot, method="cnet_ot")
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(ref.fun, abs=1e-7)


def test_perturb_with_fixed_columns_and_duplicate_rows():
    import smart_crossover_tpu as scx

    rng = np.random.default_rng(5)
    m, n = 8, 20
    A = rng.standard_normal((m, n))
    A[m - 1] = A[0]                      # duplicated (rank-deficient) row
    x0 = rng.uniform(0.2, 0.8, n)
    b = A @ x0
    l = np.zeros(n)
    u = np.ones(n)
    l[3] = u[3] = x0[3]                  # fixed column
    lp = scx.GeneralLP(A=A, b=b, c=rng.standard_normal(n), l=l, u=u,
                       sense=np.full(m, "="))
    out = scx.run_perturb_algorithm(lp)
    ref = linprog(lp.c, A_eq=A, b_eq=b, bounds=list(zip(l, u)),
                  method="highs")
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(ref.fun, abs=1e-7)


def test_ot_extreme_cost_dynamic_range(rng):
    import smart_crossover_tpu as scx
    from smart_crossover_tpu.solvers.sinkhorn import sinkhorn

    ot0 = random_ot(rng, 8, 8)
    M = ot0.M * np.logspace(-5, 5, 8)[None, :]
    ot = scx.OptTransport(s=ot0.s, d=ot0.d, M=M)
    x = sinkhorn(ot, reg=0.01, num_iters=2000)
    assert np.all(np.isfinite(x))
    out = scx.network_crossover(x=x, ot=ot, method="cnet_ot")
    mcf = ot.to_MCF()
    ref = linprog(mcf.c, A_eq=mcf.A.toarray(), b_eq=mcf.b,
                  bounds=[(0, None)] * mcf.n, method="highs")
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(ref.fun, rel=1e-7, abs=1e-6)


def test_one_by_one_lp():
    import smart_crossover_tpu as scx

    lp = scx.GeneralLP(A=np.array([[2.0]]), b=np.array([1.0]),
                       c=np.array([3.0]), l=np.zeros(1), u=np.ones(1),
                       sense=np.array(["="]))
    assert scx.solve_lp(lp, method="simplex").obj_val == pytest.approx(1.5)
    assert scx.run_perturb_algorithm(lp).obj_val == pytest.approx(1.5)
