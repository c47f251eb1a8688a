import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import linprog

from smart_crossover_tpu.data.mps import read_mps
from smart_crossover_tpu.data.mps_write import write_mps
from smart_crossover_tpu.models import GeneralLP
from smart_crossover_tpu.solvers.presolve import PresolveError, presolve_lp
from smart_crossover_tpu.solvers.solving import solve_lp


def highs_obj(lp):
    A = sp.csr_matrix(lp.A)
    eq = lp.sense == "="
    res = linprog(lp.c,
                  A_eq=A[eq].toarray() if eq.any() else None,
                  b_eq=lp.b[eq] if eq.any() else None,
                  A_ub=A[~eq].toarray() if (~eq).any() else None,
                  b_ub=lp.b[~eq] if (~eq).any() else None,
                  bounds=[(lo if np.isfinite(lo) else None,
                           up if np.isfinite(up) else None)
                          for lo, up in zip(lp.l, lp.u)], method="highs")
    return res


def test_presolve_reductions_and_postsolve(rng):
    # build an LP with a fixed var, a singleton row, an empty row/col
    m, n = 6, 10
    A = rng.standard_normal((m, n))
    A[2, :] = 0.0                       # empty row
    A[3, :] = 0.0
    A[3, 7] = 2.0                       # singleton '=' row -> fixes x7
    A[:, 9] = 0.0                       # empty column
    x0 = rng.uniform(0.2, 0.8, n)
    l = np.zeros(n)
    u = np.ones(n)
    l[5] = u[5] = 0.4                   # fixed column
    x0[5] = 0.4
    x0[7] = 0.3
    b = A @ x0
    b[2] = 0.0
    sense = np.full(m, "=")
    c = rng.standard_normal(n)
    c[9] = 1.0                          # empty col -> goes to lower
    lp = GeneralLP(A=A, b=b, c=c, l=l, u=u, sense=sense)
    red, info = presolve_lp(lp)
    assert red.n <= n - 3 and red.m <= m - 2
    # solve reduced, postsolve, compare objective with full solve
    out = solve_lp(red, method="simplex")
    assert out.status == "OPTIMAL"
    x_full = info.postsolve_x(out.x)
    ref = highs_obj(lp)
    assert ref.status == 0
    assert lp.c @ x_full == pytest.approx(ref.fun, abs=1e-7)
    assert x_full[5] == 0.4 and x_full[7] == pytest.approx(b[3] / 2.0)


def test_presolve_detects_infeasible():
    lp = GeneralLP(A=np.zeros((1, 2)), b=np.array([1.0]), c=np.ones(2),
                   l=np.zeros(2), u=np.ones(2), sense=np.array(["="]))
    with pytest.raises(PresolveError) as e:
        presolve_lp(lp)
    assert e.value.status == "INFEASIBLE"


def test_presolve_detects_unbounded_empty_column():
    A = np.array([[1.0, 0.0]])
    lp = GeneralLP(A=A, b=np.array([1.0]), c=np.array([0.0, -1.0]),
                   l=np.zeros(2), u=np.array([2.0, np.inf]),
                   sense=np.array(["="]))
    with pytest.raises(PresolveError) as e:
        presolve_lp(lp)
    assert e.value.status == "UNBOUNDED"


def test_mps_roundtrip(rng, tmp_path):
    m, n = 5, 12
    A = rng.standard_normal((m, n)) * (rng.uniform(size=(m, n)) < 0.5)
    x0 = rng.uniform(0.2, 0.8, n)
    b = A @ x0 + np.array([0, 0.2, 0, 0, 0.1])
    sense = np.array(["=", "<", "=", "=", "<"])
    l = np.zeros(n)
    u = np.ones(n)
    l[0], u[0] = -np.inf, np.inf
    l[1] = -2.0
    lp = GeneralLP(A=A, b=b, c=rng.standard_normal(n), l=l, u=u, sense=sense,
                   name="roundtrip")
    p = tmp_path / "rt.mps"
    write_mps(lp, p)
    lp2 = read_mps(p)
    assert lp2.n == n and lp2.m == m
    np.testing.assert_allclose(np.asarray(sp.csr_matrix(lp2.A).todense()),
                               A, atol=1e-12)
    np.testing.assert_allclose(lp2.b, b)
    np.testing.assert_allclose(lp2.c, lp.c)
    np.testing.assert_allclose(lp2.l, l)
    np.testing.assert_allclose(lp2.u, u)
    ref1 = highs_obj(lp)
    ref2 = highs_obj(lp2)
    assert ref1.fun == pytest.approx(ref2.fun, abs=1e-9)

def test_solve_lp_runs_presolve_when_on(rng):
    """presolve='on' must actually reduce the LP in solve_lp (ADVICE r1) and
    the postsolved answer must match HiGHS on the original instance."""
    m, n = 6, 10
    A = rng.standard_normal((m, n))
    A[2, :] = 0.0                        # empty row
    A[3, :] = 0.0
    A[3, 7] = 2.0                        # singleton '=' row fixes x7
    x0 = rng.uniform(0.2, 0.8, n)
    l = np.zeros(n)
    u = np.ones(n)
    l[5] = u[5] = 0.4                    # fixed column
    x0[5] = 0.4
    b = A @ x0
    b[2] = 0.0
    c = rng.standard_normal(n)
    lp = GeneralLP(A=A, b=b, c=c, l=l, u=u, sense=np.full(m, "="))
    ref = highs_obj(lp)
    assert ref.status == 0

    from smart_crossover_tpu.solvers.settings import SolverSettings
    for method in ("simplex", "barrier"):
        out = solve_lp(lp, method=method,
                       settings=SolverSettings(presolve="on", crossover="on"))
        assert out.status == "OPTIMAL"
        assert out.obj_val == pytest.approx(ref.fun, abs=1e-7)
        assert out.x.size == n
        assert out.x[5] == pytest.approx(0.4, abs=1e-9)
        assert out.x[7] == pytest.approx(b[3] / 2.0, abs=1e-9)
        np.testing.assert_allclose(np.asarray(lp.A) @ out.x, b, atol=1e-7)
        assert out.y is not None and out.y.size == m
        assert out.basis is not None and out.basis.vbasis.size == n

    # the warm simplex restarted from the presolved basis must accept it
    out2 = solve_lp(lp, method="simplex", warm_start_basis=out.basis,
                    settings=SolverSettings(presolve="on"))
    assert out2.status == "OPTIMAL"
    assert out2.obj_val == pytest.approx(ref.fun, abs=1e-7)


def test_solve_lp_presolve_detects_infeasible_singleton(rng):
    A = np.zeros((1, 2))
    A[0, 0] = 1.0
    lp = GeneralLP(A=A, b=np.array([5.0]), c=np.ones(2),
                   l=np.zeros(2), u=np.ones(2), sense=np.array(["="]))
    from smart_crossover_tpu.solvers.settings import SolverSettings
    out = solve_lp(lp, method="simplex",
                   settings=SolverSettings(presolve="on"))
    assert out.status == "INFEASIBLE"


def test_certify_lp_accepts_fixed_columns_with_any_rcost(rng):
    """A fixed column (l == u) may carry arbitrary reduced cost at
    optimality (ADVICE r1)."""
    from smart_crossover_tpu.solvers.certificates import certify_lp

    n = 5
    A = np.eye(2, n)
    l = np.zeros(n)
    u = np.ones(n)
    l[4] = u[4] = 0.5
    c = np.ones(n)
    c[4] = -100.0                        # huge negative rc on the fixed col
    x0 = np.array([0.3, 0.7, 0.0, 0.0, 0.5])
    lp = GeneralLP(A=A, b=A @ x0, c=c, l=l, u=u, sense=np.full(2, "="))
    out = solve_lp(lp, method="simplex")
    assert out.status == "OPTIMAL"
    cert = certify_lp(lp, out.x, out.y)
    assert cert.optimal


def test_singleton_fix_basis_lift_is_structural(rng):
    """Regression (ADVICE r2): a singleton-row-fixed column whose value is
    strictly interior must be lifted BASIC in the dropped row (vbasis=0,
    cbasis=-1), not nonbasic-at-lower — otherwise a warm start
    reconstructs x_j = l_j and starts from an inconsistent basis."""
    m, n = 5, 9
    A = rng.standard_normal((m, n))
    A[3, :] = 0.0
    A[3, 7] = 2.0                       # singleton '=' row -> x7 = b3/2
    x0 = rng.uniform(0.2, 0.8, n)
    x0[7] = 0.37                        # strictly interior fixed value
    b = A @ x0
    c = rng.standard_normal(n)
    lp = GeneralLP(A=A, b=b, c=c, l=np.zeros(n), u=np.ones(n),
                   sense=np.full(m, "="))
    ref = highs_obj(lp)
    assert ref.status == 0

    from smart_crossover_tpu.solvers.settings import SolverSettings
    out = solve_lp(lp, method="simplex",
                   settings=SolverSettings(presolve="on"))
    assert out.status == "OPTIMAL"
    assert out.basis.vbasis[7] == 0     # basic in the dropped row
    assert out.basis.cbasis[3] == -1
    assert out.x[7] == pytest.approx(0.37, abs=1e-9)

    # the lifted basis must be a consistent warm start with presolve OFF
    out2 = solve_lp(lp, method="simplex", warm_start_basis=out.basis,
                    settings=SolverSettings(presolve="off"))
    assert out2.status == "OPTIMAL"
    assert out2.obj_val == pytest.approx(ref.fun, abs=1e-7)
