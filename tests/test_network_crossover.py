import dataclasses

import numpy as np
import pytest
from scipy.optimize import linprog

from smart_crossover_tpu.models import MinCostFlow
from smart_crossover_tpu.network_methods import network_crossover
from smart_crossover_tpu.solvers.sinkhorn import sinkhorn
from tests.conftest import random_ot


def ot_optimum(ot):
    mcf = ot.to_MCF()
    res = linprog(mcf.c, A_eq=mcf.A.toarray(), b_eq=mcf.b,
                  bounds=[(0, None)] * mcf.n, method="highs")
    assert res.status == 0
    return res.fun


@pytest.mark.parametrize("method", ["tnet", "cnet_ot"])
def test_ot_crossover_from_sinkhorn(rng, method):
    ot = random_ot(rng, 10, 12)
    x = sinkhorn(ot, reg=0.05, num_iters=300)
    out = network_crossover(x=x, ot=ot, method=method)
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(ot_optimum(ot), rel=1e-8, abs=1e-8)
    # solution is a vertex flow of the (possibly extended) problem
    assert out.x is not None and np.all(np.asarray(out.x) >= -1e-9)


def test_tnet_from_exact_interior_point(rng):
    # with a very accurate interior flow, TNET should need few pivots
    ot = random_ot(rng, 8, 8)
    x = sinkhorn(ot, reg=0.005, num_iters=3000)
    out = network_crossover(x=x, ot=ot, method="tnet")
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(ot_optimum(ot), rel=1e-8, abs=1e-8)


def test_cnet_mcf_crossover(rng):
    # capacitated random MCF; interior x from HiGHS interior point-ish:
    # use the LP optimum + noise as the inaccurate flow
    m, extra = 10, 25
    tails = np.array(list(range(m - 1)) + list(rng.integers(0, m, extra)))
    heads = np.array(list(range(1, m)) + list(rng.integers(0, m, extra)))
    fix = tails == heads
    heads[fix] = (heads[fix] + 1) % m
    n = tails.size
    b = rng.uniform(-1, 1, m)
    b -= b.mean()
    u = np.concatenate([np.full(m - 1, 50.0), rng.uniform(0.5, 2.0, extra)])
    c = rng.uniform(0.5, 4.0, n)
    mcf = MinCostFlow(tails=tails, heads=heads, c=c, u=u, b=b)
    res = linprog(mcf.c, A_eq=mcf.A.toarray(), b_eq=mcf.b,
                  bounds=[(0, ub) for ub in u], method="highs")
    assert res.status == 0
    x_noisy = np.clip(res.x + rng.uniform(-0.05, 0.05, n), 0, u)
    out = network_crossover(x=x_noisy, mcf=mcf, method="cnet_mcf")
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(res.fun, rel=1e-8, abs=1e-8)


def test_crossover_rejects_bad_method(rng):
    ot = random_ot(rng, 3, 3)
    with pytest.raises(ValueError):
        network_crossover(x=np.zeros(9), ot=ot, method="nope")
    with pytest.raises(ValueError):
        network_crossover(x=np.zeros(9), method="tnet")


def test_crossover_validates_x_length(rng):
    ot = random_ot(rng, 4, 4)
    with pytest.raises(ValueError, match="arcs"):
        network_crossover(x=np.zeros(7), ot=ot, method="tnet")
    mcf = ot.to_MCF()
    with pytest.raises(ValueError, match="arcs"):
        network_crossover(x=np.zeros(3), mcf=mcf, method="cnet_mcf")


def test_column_generation_queue_exhaustion(rng):
    """Force CG failure by handing it an empty queue."""
    from smart_crossover_tpu.network_methods import column_generation
    from smart_crossover_tpu.network_methods.managers import OTManager

    ot = random_ot(rng, 4, 4)
    mgr = OTManager(ot)
    mgr.get_mcf()
    mgr.set_initial_basis()
    out = column_generation(mgr, queue=np.array([], dtype=np.int64))
    assert out.status == "CG_FAILED"


def test_cnet_mcf_tolerates_supply_roundoff(rng):
    """Supplies printed at ~10 significant digits (a common state of
    user-provided DIMACS files) leave an O(m*eps_print) net imbalance that
    only the big-M artificials can absorb; the optimality check must treat
    such sub-tolerance artificial flow as zero and the reported objective
    must exclude its big-M penalty."""
    from smart_crossover_tpu.data.mcf_gen import transshipment_mcf
    from smart_crossover_tpu.solvers.network_simplex import network_simplex

    mcf = transshipment_mcf(m=300, arcs_per_node=8, num_terminals=30, seed=4)
    b_round = np.array([float(f"{v:.8g}") for v in mcf.b])
    assert abs(b_round.sum()) > 1e-10  # the roundoff creates real imbalance
    mcf = dataclasses.replace(mcf, b=b_round)

    exact = network_simplex(mcf)
    assert exact.status == "OPTIMAL"
    x_warm = np.clip(exact.x + rng.normal(0, 1e-3, mcf.n), 0, mcf.u)
    out = network_crossover(x=x_warm, mcf=mcf, method="cnet_mcf")
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(exact.obj_val, rel=1e-6)


def test_crossover_recovers_from_garbage_warm_start(rng):
    """A warm start so bad the ranking frees arcs in a useless order must
    still produce the exact optimum (direct-solve fallback on CG failure,
    or plain CG success — either way the answer must be right)."""
    ot = random_ot(rng, 12, 12)
    x_garbage = np.zeros(144)
    x_garbage[0] = 1e6  # all mass indicator on one arc, nothing elsewhere
    out = network_crossover(x=x_garbage, ot=ot, method="cnet_ot")
    assert out.status == "OPTIMAL"
    mcf = ot.to_MCF()
    ref = linprog(mcf.c, A_eq=mcf.A.toarray(), b_eq=mcf.b,
                  bounds=[(0, None)] * mcf.n, method="highs")
    assert out.obj_val == pytest.approx(ref.fun, abs=1e-8)
