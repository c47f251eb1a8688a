import numpy as np
import pytest
from scipy.optimize import linprog

from smart_crossover_tpu.models import Basis, MinCostFlow
from smart_crossover_tpu.solvers.network_simplex import network_simplex
from tests.conftest import random_ot


def linprog_oracle(mcf):
    bounds = [(0, None if not np.isfinite(ub) else ub) for ub in mcf.u]
    res = linprog(mcf.c, A_eq=mcf.A.toarray(), b_eq=mcf.b, bounds=bounds,
                  method="highs")
    return res


def check_optimal(mcf, res, oracle, tol=1e-7):
    assert res.status == "OPTIMAL"
    # primal feasibility
    np.testing.assert_allclose(mcf.A @ res.x, mcf.b, atol=1e-8)
    assert np.all(res.x >= -1e-9)
    assert np.all(res.x <= mcf.u + 1e-9)
    # optimal objective matches HiGHS
    assert res.obj_val == pytest.approx(oracle.fun, abs=tol, rel=1e-9)
    # dual optimality certificate: rcost >= 0 off upper bounds, <= 0 at upper
    rc = res.rcost
    at_up = res.basis.vbasis == -2
    assert np.all(rc[~at_up] >= -1e-7)
    assert np.all(rc[at_up] <= 1e-7)
    # basic arcs have zero reduced cost
    assert np.all(np.abs(rc[res.basis.vbasis == 0]) <= 1e-7)


def test_tiny_path_network():
    # 3 nodes in a line: 0 -> 1 -> 2, supply 2 at node0, demand 2 at node2
    mcf = MinCostFlow(tails=[0, 1, 0], heads=[1, 2, 2],
                      c=[1.0, 1.0, 5.0], u=[10.0, 10.0, 10.0],
                      b=[-2.0, 0.0, 2.0])
    res = network_simplex(mcf, use_native=False)
    check_optimal(mcf, res, linprog_oracle(mcf))
    np.testing.assert_allclose(res.x, [2.0, 2.0, 0.0], atol=1e-9)


def test_capacity_forces_expensive_arc():
    mcf = MinCostFlow(tails=[0, 1, 0], heads=[1, 2, 2],
                      c=[1.0, 1.0, 5.0], u=[1.0, 10.0, 10.0],
                      b=[-2.0, 0.0, 2.0])
    res = network_simplex(mcf, use_native=False)
    check_optimal(mcf, res, linprog_oracle(mcf))
    np.testing.assert_allclose(res.x, [1.0, 1.0, 1.0], atol=1e-9)


def test_random_ot_instances(rng):
    for ns, nd in [(4, 5), (8, 6), (10, 10)]:
        ot = random_ot(rng, ns, nd)
        mcf = ot.to_MCF()
        res = network_simplex(mcf, use_native=False)
        check_optimal(mcf, res, linprog_oracle(mcf))


def test_random_capacitated_mcf(rng):
    # random graph with finite capacities, guaranteed feasible via a spanning
    # backbone of high-capacity arcs
    m = 12
    extra = 30
    tails = list(range(m - 1)) + list(rng.integers(0, m, extra))
    heads = list(range(1, m)) + list(rng.integers(0, m, extra))
    # remove self loops in the random part
    tails, heads = zip(*[(t, h) if t != h else (t, (h + 1) % m)
                         for t, h in zip(tails, heads)])
    n = len(tails)
    b = rng.uniform(-1, 1, m)
    b -= b.mean()
    u = np.concatenate([np.full(m - 1, 50.0), rng.uniform(0.3, 2.0, extra)])
    c = rng.uniform(0.5, 4.0, n)
    mcf = MinCostFlow(tails=np.array(tails), heads=np.array(heads), c=c, u=u, b=b)
    res = network_simplex(mcf, use_native=False)
    check_optimal(mcf, res, linprog_oracle(mcf))


def test_infeasible_detected():
    # demand node unreachable (capacity 0 arc)
    mcf = MinCostFlow(tails=[0], heads=[1], c=[1.0], u=[0.5],
                      b=[-2.0, 2.0])
    res = network_simplex(mcf, use_native=False)
    assert res.status == "INFEASIBLE"


def test_warm_start_reduces_iterations(rng):
    ot = random_ot(rng, 10, 10)
    mcf = ot.to_MCF()
    cold = network_simplex(mcf, use_native=False)
    assert cold.status == "OPTIMAL"
    warm = network_simplex(mcf, warm_basis=cold.basis, use_native=False)
    assert warm.status == "OPTIMAL"
    assert warm.obj_val == pytest.approx(cold.obj_val, rel=1e-9, abs=1e-9)
    assert warm.iter_count == 0  # optimal basis -> no pivots


def test_warm_start_from_partial_basis(rng):
    ot = random_ot(rng, 8, 7)
    mcf = ot.to_MCF()
    oracle = linprog_oracle(mcf)
    # a plausible but wrong warm basis: everything nonbasic at lower
    wb = Basis(np.full(mcf.n, -1), np.concatenate([-np.ones(mcf.m - 1), [0]]))
    res = network_simplex(mcf, warm_basis=wb, use_native=False)
    check_optimal(mcf, res, oracle)


def test_unbounded_negative_cycle():
    # negative-cost cycle with infinite capacity
    mcf = MinCostFlow(tails=[0, 1, 2], heads=[1, 2, 0],
                      c=[-1.0, -1.0, -1.0], u=[np.inf] * 3,
                      b=[0.0, 0.0, 0.0])
    for native in (False, True):
        res = network_simplex(mcf, use_native=native)
        assert res.status == "UNBOUNDED"
