"""Tree-preconditioned PCG normal equations (solvers/laplacian.py).

Covers VERDICT.md round-1 item 3: ``method='barrier'`` on large min-cost
-flow must hit 1e-8 directly (no silent first-order reroute).  Oracle:
scipy HiGHS / dense solves.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from smart_crossover_tpu.data.mcf_gen import goto_like_mcf, transshipment_mcf
from smart_crossover_tpu.solvers.laplacian import (
    analyze_network,
    make_tree_pcg_ne_solver,
)


def _mcf_mats(mcf):
    A = sp.csr_matrix(mcf.A).astype(np.float64)
    return A, A.T.tocsr()


def test_analyze_network_detects_incidence():
    mcf = transshipment_mcf(m=40, seed=0)
    ns = analyze_network(mcf.A)
    assert ns is not None
    assert ns.arc_cols.size == mcf.n
    assert ns.single_cols.size == 0
    # tails/heads consistent with the incidence columns
    A = sp.csc_matrix(mcf.A)
    j = int(ns.arc_cols[3])
    col = A.getcol(j).toarray().ravel()
    assert col[ns.tails[3]] == -1.0 and col[ns.heads[3]] == 1.0


def test_analyze_network_rejects_general_matrices():
    rng = np.random.default_rng(0)
    A = sp.random(20, 50, density=0.3, random_state=0)
    assert analyze_network(A) is None
    # right sparsity but non-unit entries
    mcf = transshipment_mcf(m=30, seed=1)
    A2 = sp.csc_matrix(mcf.A) * 2.0
    assert analyze_network(A2) is None


def test_analyze_network_single_entry_columns():
    """Big-M artificial arcs appear as one-entry columns (grounding)."""
    mcf = transshipment_mcf(m=30, seed=2)
    A = sp.csc_matrix(mcf.A)
    art = sp.diags(np.where(mcf.b == 0, 1.0, np.sign(mcf.b))).tocsc()
    ns = analyze_network(sp.hstack([A, art]))
    assert ns is not None
    assert ns.single_cols.size == mcf.m


@pytest.mark.parametrize("spread", [0, 4, 8, 12])
def test_tree_pcg_matches_dense_solve(spread):
    mcf = transshipment_mcf(m=80, seed=3)
    A, AT = _mcf_mats(mcf)
    ns = analyze_network(A)
    rng = np.random.default_rng(spread)
    d = 10.0 ** rng.uniform(-spread / 2, spread / 2, mcf.n)
    reg = 1e-12 * (1.0 + float((A.power(2) @ d).max()))
    solve = make_tree_pcg_ne_solver(ns, A, AT, d, reg, abs_tol=1e-12)
    rhs = A @ (d * rng.standard_normal(mcf.n))
    x = solve(rhs)
    res = rhs - (A @ (d * (AT @ x)) + reg * x)
    # grounded component: compare residual off the pinned nullspace
    assert np.linalg.norm(res) <= 1e-8 * (1.0 + np.linalg.norm(rhs))


def test_tree_pcg_grounded_laplacian_with_singles():
    """Diagonal (artificial-arc) weight grounds the system: no pinning."""
    mcf = transshipment_mcf(m=60, seed=4)
    A0 = sp.csc_matrix(mcf.A)
    art = sp.eye(mcf.m, format="csc")[:, :5]
    A = sp.csr_matrix(sp.hstack([A0, art]))
    AT = A.T.tocsr()
    ns = analyze_network(A)
    n = A.shape[1]
    rng = np.random.default_rng(0)
    d = 10.0 ** rng.uniform(-3, 3, n)
    reg = 1e-12 * (1.0 + float((A.power(2) @ d).max()))
    solve = make_tree_pcg_ne_solver(ns, A, AT, d, reg)
    M = (A @ sp.diags(d) @ AT).toarray() + reg * np.eye(mcf.m)
    rhs = rng.standard_normal(mcf.m)
    x = solve(rhs)
    x_ref = np.linalg.solve(M, rhs)
    assert np.linalg.norm(x - x_ref) <= 1e-6 * (1.0 + np.linalg.norm(x_ref))


def test_large_mcf_barrier_direct_1e8():
    """The round-1 gap: barrier on a >2000-node MCF must reach 1e-8 via the
    IPM itself (tree-PCG normal equations), not a PDHG reroute."""
    from smart_crossover_tpu.solvers.ipm import ipm_solve

    mcf = transshipment_mcf(m=2500, seed=5)
    assert mcf.m > 2000   # above _NE_PCG_MIN_M: exercises the PCG path
    res = ipm_solve(mcf.A, mcf.b, mcf.c, np.zeros(mcf.n), mcf.u, tol=1e-8)
    assert res.status == "OPTIMAL"
    # KKT at 1e-8 for real
    A = sp.csr_matrix(mcf.A)
    pinf = np.linalg.norm(mcf.b - A @ res.x) / (1.0 + np.linalg.norm(mcf.b))
    assert pinf < 1e-7
    from scipy.optimize import linprog

    ref = linprog(mcf.c, A_eq=mcf.A, b_eq=mcf.b,
                  bounds=np.stack([np.zeros(mcf.n), mcf.u], axis=1),
                  method="highs")
    assert abs(res.obj_val - ref.fun) / (1.0 + abs(ref.fun)) < 1e-7


def test_solve_mcf_barrier_no_reroute():
    """solve_mcf(method='barrier') reports barrier iterations (an IPM ran,
    not PDHG) and an OPTIMAL interior point at tolerance."""
    from smart_crossover_tpu.solvers.settings import SolverSettings
    from smart_crossover_tpu.solvers.solving import solve_mcf

    mcf = goto_like_mcf(width=50, height=50, seed=6)
    assert mcf.m > 2000
    out = solve_mcf(mcf, method="barrier",
                    settings=SolverSettings(crossover="off"))
    assert out.status == "OPTIMAL"
    assert out.bar_iter_count is not None and out.bar_iter_count < 100
    A = sp.csr_matrix(mcf.A)
    pinf = np.linalg.norm(mcf.b - A @ out.x) / (1.0 + np.linalg.norm(mcf.b))
    assert pinf < 1e-7
