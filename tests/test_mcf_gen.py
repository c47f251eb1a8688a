import numpy as np
import pytest
from scipy.optimize import linprog

from smart_crossover_tpu.data.mcf_gen import goto_like_mcf, transshipment_mcf
from smart_crossover_tpu.network_methods import network_crossover
from smart_crossover_tpu.solvers.ipm import ipm_solve
from smart_crossover_tpu.solvers.network_simplex import network_simplex


@pytest.mark.parametrize("gen", [
    lambda: goto_like_mcf(width=8, height=8, seed=3),
    lambda: transshipment_mcf(m=60, seed=1),
])
def test_generated_instances_feasible_and_match_highs(gen):
    mcf = gen()
    res = network_simplex(mcf)
    assert res.status == "OPTIMAL"
    ref = linprog(mcf.c, A_eq=mcf.A.toarray(), b_eq=mcf.b,
                  bounds=[(0, ub) for ub in mcf.u], method="highs")
    assert ref.status == 0
    assert res.obj_val == pytest.approx(ref.fun, rel=1e-9, abs=1e-7)


@pytest.mark.parametrize("gen", [
    lambda: goto_like_mcf(width=10, height=10, seed=5),
    lambda: transshipment_mcf(m=80, seed=2),
])
def test_cnet_mcf_on_generated_instances(gen):
    mcf = gen()
    cold = network_simplex(mcf)
    assert cold.status == "OPTIMAL"
    bar = ipm_solve(mcf.A, mcf.b, mcf.c, np.zeros(mcf.n), mcf.u, tol=1e-8)
    assert bar.status == "OPTIMAL"
    out = network_crossover(x=bar.x, mcf=mcf, method="cnet_mcf")
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(cold.obj_val, rel=1e-8, abs=1e-6)


def test_generators_deterministic():
    a = goto_like_mcf(width=6, height=6, seed=7)
    b = goto_like_mcf(width=6, height=6, seed=7)
    np.testing.assert_array_equal(a.c, b.c)
    np.testing.assert_array_equal(a.b, b.b)
