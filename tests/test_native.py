import numpy as np
import pytest

from smart_crossover_tpu.native import native_available
from tests.conftest import random_ot


@pytest.fixture(scope="module", autouse=True)
def ensure_native():
    if not native_available():
        try:
            from smart_crossover_tpu.native.build import build

            build(verbose=False)
            # reset the load cache
            import smart_crossover_tpu.native as nat

            nat._LOAD_ATTEMPTED = False
            nat._LIB = None
        except Exception:
            pytest.skip("native toolchain unavailable")
    if not native_available():
        pytest.skip("native library failed to load")


def test_native_matches_python_on_ot(rng):
    from smart_crossover_tpu.solvers.network_simplex import network_simplex

    for ns, nd in [(5, 8), (15, 12), (25, 25)]:
        ot = random_ot(rng, ns, nd)
        mcf = ot.to_MCF()
        py = network_simplex(mcf, use_native=False)
        nat = network_simplex(mcf, use_native=True)
        assert nat.status == py.status == "OPTIMAL"
        assert nat.obj_val == pytest.approx(py.obj_val, rel=1e-10, abs=1e-9)
        np.testing.assert_allclose(mcf.A @ nat.x, mcf.b, atol=1e-8)
        # duals certify optimality
        rc = nat.rcost
        at_up = nat.basis.vbasis == -2
        assert np.all(rc[~at_up] >= -1e-7)


def test_native_capacitated_and_warm(rng):
    from smart_crossover_tpu.models import MinCostFlow
    from smart_crossover_tpu.solvers.network_simplex import network_simplex

    m, extra = 30, 120
    tails = np.concatenate([np.arange(m - 1), rng.integers(0, m, extra)])
    heads = np.concatenate([np.arange(1, m), rng.integers(0, m, extra)])
    loop = tails == heads
    heads[loop] = (heads[loop] + 1) % m
    n = tails.size
    b = rng.uniform(-1, 1, m)
    b -= b.mean()
    u = np.concatenate([np.full(m - 1, 50.0), rng.uniform(0.3, 2.0, extra)])
    c = rng.uniform(0.5, 4.0, n)
    mcf = MinCostFlow(tails=tails, heads=heads, c=c, u=u, b=b)
    py = network_simplex(mcf, use_native=False)
    nat = network_simplex(mcf, use_native=True)
    assert nat.obj_val == pytest.approx(py.obj_val, rel=1e-10, abs=1e-9)
    warm = network_simplex(mcf, warm_basis=nat.basis, use_native=True)
    assert warm.iter_count == 0
    # cross-engine warm start: python basis into native and vice versa
    cross = network_simplex(mcf, warm_basis=py.basis, use_native=True)
    assert cross.iter_count == 0


def test_native_infeasible(rng):
    from smart_crossover_tpu.models import MinCostFlow
    from smart_crossover_tpu.solvers.network_simplex import network_simplex

    mcf = MinCostFlow(tails=[0], heads=[1], c=[1.0], u=[0.5], b=[-2.0, 2.0])
    res = network_simplex(mcf, use_native=True)
    assert res.status == "INFEASIBLE"


def test_native_speed_on_larger_instance(rng):
    import time

    from smart_crossover_tpu.solvers.network_simplex import network_simplex

    ot = random_ot(rng, 60, 60)
    mcf = ot.to_MCF()
    t0 = time.perf_counter()
    nat = network_simplex(mcf, use_native=True)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    py = network_simplex(mcf, use_native=False)
    t_py = time.perf_counter() - t0
    assert nat.obj_val == pytest.approx(py.obj_val, rel=1e-9, abs=1e-8)
    # the native core should be much faster (don't assert a ratio to avoid
    # flakes, but record it in the assertion message on failure)
    assert nat.status == "OPTIMAL", f"native {t_nat:.3f}s vs python {t_py:.3f}s"
