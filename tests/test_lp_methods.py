import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import linprog

from smart_crossover_tpu.lp_methods.algorithms import (
    check_feasibility_problem,
    get_projector_c,
    perturb_c,
    run_perturb_algorithm,
)
from smart_crossover_tpu.lp_methods.lp_manager import LPManager
from smart_crossover_tpu.models import Basis, GeneralLP


def random_general_lp(rng, m=8, n=20, frac_ineq=0.4, with_free=False):
    A = rng.standard_normal((m, n))
    x0 = rng.uniform(0.2, 0.8, n)
    slack = np.where(rng.uniform(size=m) < frac_ineq, 0.3, 0.0)
    b = A @ x0 + slack
    sense = np.where(slack > 0, "<", "=")
    l = np.zeros(n)
    u = np.ones(n)
    if with_free:
        l[:2] = -np.inf
        u[:2] = np.inf
    c = rng.standard_normal(n)
    if with_free:
        # keep bounded: free-variable costs in the row space of A
        y0 = rng.standard_normal(m)
        c[:2] = (A.T @ y0)[:2]
    return GeneralLP(A=A, b=b, c=c, l=l, u=u, sense=sense)


def highs_on_general(lp):
    A = sp.csr_matrix(lp.A)
    eq = lp.sense == "="
    le = ~eq
    res = linprog(lp.c,
                  A_eq=A[eq].toarray() if eq.any() else None,
                  b_eq=lp.b[eq] if eq.any() else None,
                  A_ub=A[le].toarray() if le.any() else None,
                  b_ub=lp.b[le] if le.any() else None,
                  bounds=[(lo if np.isfinite(lo) else None,
                           up if np.isfinite(up) else None)
                          for lo, up in zip(lp.l, lp.u)],
                  method="highs")
    assert res.status == 0
    return res


def test_lp_manager_fix_and_recover(rng):
    lp = random_general_lp(rng, m=4, n=10)
    mgr = LPManager(lp.copy())
    mgr.fix_variables(ind_fix_to_low=np.array([0, 3]),
                      ind_fix_to_up=np.array([5]))
    mgr.fix_constraints(ind_fix_to_up=np.array([1]))
    mgr.update_subproblem()
    assert mgr.lp_sub.n == 7
    assert mgr.lp_sub.sense[1] == "="
    assert mgr.get_num_fixed_variables() == 3
    x_sub = np.arange(7, dtype=float)
    x = mgr.get_orix(x_sub)
    assert x[0] == lp.l[0] and x[5] == lp.u[5]
    sub_basis = Basis(np.zeros(7), -np.ones(4))
    full = mgr.recover_basis_from_sub_basis(sub_basis)
    assert full.vbasis[5] == -2 and full.vbasis[0] == -1


def test_projector_c_nullspace(rng):
    lp = random_general_lp(rng, m=5, n=12)
    pc = get_projector_c(lp)
    A_std = lp.get_standard_A()
    # projection lies (approximately) in null(A_std)
    assert np.linalg.norm(A_std @ pc) < 1e-6 * (1 + np.linalg.norm(pc))


def test_feasibility_problem_detection(rng):
    lp = random_general_lp(rng, m=5, n=12)
    # c in the row space of A_std -> projection ~ 0 -> feasibility problem
    A_std = lp.get_standard_A()
    y0 = rng.standard_normal(5)
    c_std = A_std.T @ y0
    lp_feas = GeneralLP(A=lp.A, b=lp.b, c=c_std[:12], l=lp.l, u=lp.u,
                        sense=lp.sense)
    # note: exact row-space membership only holds without '<' slacks
    lp_eq = GeneralLP(A=lp.A, b=lp.b, c=(lp.A.T @ y0), l=lp.l, u=lp.u,
                      sense=np.full(5, "="))
    assert check_feasibility_problem(lp_eq)
    assert not check_feasibility_problem(lp)


def test_perturb_c_deterministic(rng):
    lp = random_general_lp(rng, m=5, n=12)
    x = rng.uniform(0.3, 0.7, 12)
    c1 = perturb_c(lp, x, is_feas=False)
    c2 = perturb_c(lp, x, is_feas=False)
    np.testing.assert_array_equal(c1, c2)
    assert np.all(c1 >= lp.c)  # perturbation is nonnegative


@pytest.mark.parametrize("seed", [0, 1])
def test_perturb_crossover_equality_lp(seed):
    rng = np.random.default_rng(seed)
    lp = random_general_lp(rng, m=8, n=20, frac_ineq=0.0)
    ref = highs_on_general(lp)
    out = run_perturb_algorithm(lp)
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(ref.fun, rel=1e-7, abs=1e-7)
    # vertex: basis sizes consistent
    assert out.basis is not None
    assert out.x_bar is not None  # interior point preserved


@pytest.mark.parametrize("seed", [3, 4])
def test_perturb_crossover_with_inequalities(seed):
    rng = np.random.default_rng(seed)
    lp = random_general_lp(rng, m=10, n=24, frac_ineq=0.5)
    ref = highs_on_general(lp)
    out = run_perturb_algorithm(lp)
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(ref.fun, rel=1e-7, abs=1e-7)


def test_perturb_crossover_with_free_vars():
    rng = np.random.default_rng(9)
    lp = random_general_lp(rng, m=8, n=18, frac_ineq=0.3, with_free=True)
    ref = highs_on_general(lp)
    out = run_perturb_algorithm(lp)
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(ref.fun, rel=1e-6, abs=1e-6)


def test_perturb_crossover_degenerate_assignment():
    """Highly degenerate LP (integer-cost assignment): the perturbation
    should reach an optimal vertex with no more pivots than the plain
    barrier crossover, and identical objective."""
    import scipy.sparse as sp

    from smart_crossover_tpu.models import OptTransport
    from smart_crossover_tpu.solvers.solving import solve_lp

    rng = np.random.default_rng(0)
    k = 8
    ot = OptTransport(s=np.ones(k), d=np.ones(k),
                      M=rng.integers(1, 5, (k, k)).astype(float))
    mcf = ot.to_MCF()
    lp = GeneralLP(A=sp.csr_matrix(mcf.A), b=mcf.b, c=mcf.c,
                   l=np.zeros(mcf.n), u=np.full(mcf.n, np.inf),
                   sense=np.full(mcf.m, "="))
    ori = solve_lp(lp, method="barrier")
    ptb = run_perturb_algorithm(lp)
    assert ori.status == ptb.status == "OPTIMAL"
    assert ptb.obj_val == pytest.approx(ori.obj_val, abs=1e-7)
    assert ptb.iter_count <= ori.iter_count


def test_perturb_crossover_feasibility_problem_branch(rng):
    # c exactly in the row space of A (all-'=' LP) -> feasibility problem:
    # perturb_c takes the cheap c+p branch, no projector needed
    m, n = 6, 14
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.2, 0.8, n)
    y0 = rng.standard_normal(m)
    lp = GeneralLP(A=A, b=b, c=A.T @ y0, l=np.zeros(n), u=np.ones(n),
                   sense=np.full(m, "="))
    assert check_feasibility_problem(lp)
    out = run_perturb_algorithm(lp)
    assert out.status == "OPTIMAL"
    ref = highs_on_general(lp)
    assert out.obj_val == pytest.approx(ref.fun, rel=1e-7, abs=1e-7)
