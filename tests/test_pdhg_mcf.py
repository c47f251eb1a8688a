"""Device arc-list PDHG for MCF (solvers/pdhg_mcf.py)."""
import numpy as np
import pytest

from smart_crossover_tpu.data.mcf_gen import goto_like_mcf, transshipment_mcf
from smart_crossover_tpu.solvers.pdhg_mcf import (
    IncidenceDeviceOp,
    pdhg_mcf_device,
)


def _incidence(mcf):
    import scipy.sparse as sp

    m, n = len(mcf.b), len(mcf.c)
    rows = np.concatenate([mcf.heads, mcf.tails])
    cols = np.concatenate([np.arange(n), np.arange(n)])
    vals = np.concatenate([np.ones(n), -np.ones(n)])
    return sp.csr_matrix((vals, (rows, cols)), shape=(m, n))


@pytest.mark.parametrize("gen,kw", [
    (goto_like_mcf, dict(width=6, height=5, extra_arc_factor=3)),
    (transshipment_mcf, dict(m=40, arcs_per_node=5)),
])
def test_incidence_op_matches_scipy(rng, gen, kw):
    import jax.numpy as jnp

    mcf = gen(seed=3, **kw)
    A = _incidence(mcf)
    m, n = A.shape
    op = IncidenceDeviceOp(mcf.tails, mcf.heads, m, dtype=jnp.float64)
    x = rng.standard_normal(n)
    y = rng.standard_normal(m)
    nperm = (op.node_perm if op.node_perm is not None
             else np.arange(m))          # N-order node relabeling
    xT = x[op.order_T]
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(xT)),
                               (A @ x)[nperm], atol=1e-9)
    aty = np.asarray(op.T @ jnp.asarray(y[nperm]))
    aty_orig = np.empty(n)
    aty_orig[op.order_T] = aty
    np.testing.assert_allclose(aty_orig, A.T @ y, atol=1e-9)


def test_incidence_op_bucketed_irregular(rng):
    """The bucketed path must handle extreme degree skew: isolated nodes,
    degree-1 leaves, and one high-degree hub."""
    import jax.numpy as jnp

    m = 23
    tails = np.array([0] * 9 + [1, 2, 3, 4, 4, 5, 5, 5, 6] + [7, 8],
                     dtype=np.int64)
    heads = np.array(list(range(10, 19)) + [0, 0, 1, 2, 3, 2, 6, 7, 8]
                     + [9, 9], dtype=np.int64)
    n = tails.size

    import scipy.sparse as sp
    rows = np.concatenate([heads, tails])
    cols = np.concatenate([np.arange(n), np.arange(n)])
    vals = np.concatenate([np.ones(n), -np.ones(n)])
    A = sp.csr_matrix((vals, (rows, cols)), shape=(m, n))

    op = IncidenceDeviceOp(tails, heads, m, dtype=jnp.float64)
    assert op.node_perm is not None
    x = rng.standard_normal(n)
    y = rng.standard_normal(m)
    xT = x[op.order_T]
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(xT)),
                               (A @ x)[op.node_perm], atol=1e-12)
    aty = np.asarray(op.T @ jnp.asarray(y[op.node_perm]))
    aty_orig = np.empty(n)
    aty_orig[op.order_T] = aty
    np.testing.assert_allclose(aty_orig, A.T @ y, atol=1e-12)


def test_pdhg_mcf_device_converges_to_optimum(rng):
    from smart_crossover_tpu.solvers.network_simplex import network_simplex

    mcf = goto_like_mcf(width=8, height=8, extra_arc_factor=3, seed=5)
    ref = network_simplex(mcf)
    assert ref.status == "OPTIMAL"
    import jax.numpy as jnp

    x, y, iters, done, rt = pdhg_mcf_device(
        mcf, tol=1e-6, max_iters=60000, dtype=jnp.float64,
        check_every=200, restart_period=400)
    assert done, f"not converged after {iters} iters"
    obj = float(mcf.c @ x)
    assert obj == pytest.approx(ref.obj_val, rel=1e-4, abs=1e-3)
    # feasibility at the requested tolerance scale
    A = _incidence(mcf)
    assert np.abs(A @ x - mcf.b).max() < 1e-3 * (1 + np.abs(mcf.b).max())


def test_pdhg_mcf_device_warm_start_shape(rng):
    import jax.numpy as jnp

    mcf = transshipment_mcf(m=30, arcs_per_node=4, seed=2)
    x0 = np.clip(rng.uniform(0, 1, mcf.n) * mcf.u, 0, mcf.u)
    x, y, iters, done, rt = pdhg_mcf_device(
        mcf, tol=1e-3, max_iters=20000, dtype=jnp.float64, x0=x0,
        y0=np.zeros(len(mcf.b)))
    assert x.shape == (mcf.n,)
    assert np.all(x >= -1e-9) and np.all(x <= mcf.u + 1e-6)


def test_regular_goto_fast_path_matches(rng):
    """Degree-regular GOTO instances take the reshape/rowsum fast path;
    operator results must equal scipy exactly and the solve must reach the
    network-simplex optimum."""
    import jax.numpy as jnp

    from smart_crossover_tpu.solvers.network_simplex import network_simplex

    mcf = goto_like_mcf(width=7, height=6, extra_arc_factor=3, seed=9,
                        regular=True)
    m, n = len(mcf.b), len(mcf.c)
    deg = np.bincount(mcf.tails, minlength=m)
    assert (deg == deg[0]).all()          # regular by construction
    op = IncidenceDeviceOp(mcf.tails, mcf.heads, m, dtype=jnp.float64)
    assert op._kt is not None and op._kh is not None
    A = _incidence(mcf)
    x = rng.standard_normal(n)
    y = rng.standard_normal(m)
    xT = x[op.order_T]
    np.testing.assert_allclose(np.asarray(op @ jnp.asarray(xT)),
                               A @ x, atol=1e-9)
    aty = np.asarray(op.T @ jnp.asarray(y))
    aty_orig = np.empty(n)
    aty_orig[op.order_T] = aty
    np.testing.assert_allclose(aty_orig, A.T @ y, atol=1e-9)

    ref = network_simplex(mcf)
    x_s, y_s, iters, done, rt = pdhg_mcf_device(
        mcf, tol=1e-6, max_iters=60000, dtype=jnp.float64,
        check_every=200, restart_period=400)
    assert done
    assert float(mcf.c @ x_s) == pytest.approx(ref.obj_val, rel=1e-4,
                                               abs=1e-3)
