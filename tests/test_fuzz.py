"""Compact randomized cross-validation sweeps (larger sweeps were run
offline during development; these keep a sentinel in CI)."""
import numpy as np
from scipy.optimize import linprog

from smart_crossover_tpu.models import MinCostFlow
from smart_crossover_tpu.solvers.network_simplex import network_simplex
from smart_crossover_tpu.solvers.simplex import dual_simplex, primal_simplex
from tests.conftest import random_ot


def test_fuzz_network_simplex_engines():
    for trial in range(8):
        rng = np.random.default_rng(trial)
        ot = random_ot(rng, int(rng.integers(3, 14)), int(rng.integers(3, 14)))
        mcf = ot.to_MCF()
        py = network_simplex(mcf, use_native=False)
        nat = network_simplex(mcf, use_native=True)
        assert py.status == nat.status == "OPTIMAL"
        assert abs(py.obj_val - nat.obj_val) <= 1e-8 * (1 + abs(py.obj_val))
        warm = network_simplex(mcf, warm_basis=py.basis, use_native=True)
        assert warm.iter_count == 0


def test_fuzz_simplex_degenerate_and_rank_deficient():
    for trial in range(8):
        rng = np.random.default_rng(1000 + trial)
        m, n = int(rng.integers(3, 10)), int(rng.integers(8, 25))
        A = rng.standard_normal((m, n))
        if trial % 2 == 0 and m >= 2:
            A[m - 1] = A[0] * 2.0
        b = A @ rng.uniform(0.2, 0.8, n)
        c = np.round(rng.standard_normal(n)) if trial % 3 == 0 \
            else rng.standard_normal(n)
        res = primal_simplex(A, b, c, np.zeros(n), np.ones(n))
        ref = linprog(c, A_eq=A, b_eq=b, bounds=[(0, 1)] * n, method="highs")
        if ref.status != 0:
            continue
        assert res.status == "OPTIMAL"
        assert abs(res.obj_val - ref.fun) < 1e-6
        b2 = b + rng.uniform(-0.02, 0.02, m)
        d = dual_simplex(A, b2, c, np.zeros(n), np.ones(n),
                         vstatus=res.vstatus)
        ref2 = linprog(c, A_eq=A, b_eq=b2, bounds=[(0, 1)] * n,
                       method="highs")
        if ref2.status == 0:
            assert d.status == "OPTIMAL"
            assert abs(d.obj_val - ref2.fun) < 1e-6
