"""Exact infeasibility/unboundedness certificates (solvers/rays.py).

The reference inherits Farkas certificates from its vendor solvers
(ref solver_caller/caller.py:164-179); these tests pin the in-house
replacement: extracted rays must VERIFY independently, and the high-level
classification must agree with scipy HiGHS on fuzzed instances.
"""
import numpy as np
import pytest
import scipy.optimize as sopt

from smart_crossover_tpu.models import GeneralLP
from smart_crossover_tpu.solvers.rays import (
    classify_lp,
    extract_farkas,
    extract_ray,
    verify_farkas,
    verify_ray,
)
from smart_crossover_tpu.solvers.settings import SolverSettings
from smart_crossover_tpu.solvers.solving import solve_lp


def test_farkas_on_contradictory_rows():
    A = np.array([[1.0, 1.0], [1.0, 1.0]])
    b = np.array([1.0, 3.0])
    l = np.zeros(2)
    u = np.full(2, np.inf)
    cert = extract_farkas(A, b, l, u)
    assert cert.status == "INFEASIBLE"
    assert verify_farkas(A, b, l, u, cert.farkas_ray) > 0


def test_farkas_on_bound_conflict():
    # x1 + x2 = 5 but both variables capped at 2
    A = np.array([[1.0, 1.0]])
    b = np.array([5.0])
    l = np.zeros(2)
    u = np.full(2, 2.0)
    cert = extract_farkas(A, b, l, u)
    assert cert.status == "INFEASIBLE"
    assert verify_farkas(A, b, l, u, cert.farkas_ray) > 0


def test_feasible_witness():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(4, 9))
    x_feas = rng.uniform(0.5, 1.5, size=9)
    b = A @ x_feas
    l = np.zeros(9)
    u = np.full(9, 10.0)
    cert = extract_farkas(A, b, l, u)
    assert cert.status == "FEASIBLE"
    assert np.abs(A @ cert.feasible_x - b).max() < 1e-7
    assert np.all(cert.feasible_x >= l - 1e-9)
    assert np.all(cert.feasible_x <= u + 1e-9)


def test_unbounded_ray_free_pair():
    # min -x1  s.t. x1 - x2 = 0, both free: d = (1, 1) improves forever
    A = np.array([[1.0, -1.0]])
    c = np.array([-1.0, 0.0])
    l = np.full(2, -np.inf)
    u = np.full(2, np.inf)
    d = extract_ray(A, c, l, u)
    assert d is not None
    assert verify_ray(A, c, l, u, d) > 0


def test_no_ray_when_bounded():
    A = np.array([[1.0, 1.0]])
    c = np.array([1.0, 1.0])
    l = np.zeros(2)
    u = np.full(2, np.inf)
    assert extract_ray(A, c, l, u) is None


def test_verify_rejects_garbage():
    A = np.array([[1.0, 1.0]])
    b = np.array([1.0])
    l = np.zeros(2)
    u = np.full(2, np.inf)
    assert verify_farkas(A, b, l, u, np.array([1.0])) <= 0
    assert verify_ray(A, np.array([-1.0, 0.0]), l, u,
                      np.array([1.0, 1.0])) <= 0  # violates A d = 0


@pytest.mark.parametrize("seed", range(12))
def test_classify_matches_highs_fuzz(seed):
    rng = np.random.default_rng(seed)
    m, n = 4, 7
    A = rng.normal(size=(m, n))
    c = rng.normal(size=n)
    l = np.where(rng.random(n) < 0.7, 0.0, -np.inf)
    u = np.where(rng.random(n) < 0.4, rng.uniform(1.0, 5.0, n), np.inf)
    kind = seed % 3
    if kind == 0:        # feasible rhs
        x0 = rng.uniform(0.1, 0.9, n)
        x0 = np.clip(x0, np.where(np.isfinite(l), l, -1.0),
                     np.where(np.isfinite(u), u, 2.0))
        b = A @ x0
    else:                # arbitrary rhs: may be infeasible
        b = rng.normal(size=m) * 10.0
    res = sopt.linprog(c, A_eq=A, b_eq=b,
                       bounds=list(zip(
                           [None if not np.isfinite(v) else v for v in l],
                           [None if not np.isfinite(v) else v for v in u])),
                       method="highs")
    cert = classify_lp(A, b, c, l, u)
    expected = {0: "FEASIBLE", 2: "INFEASIBLE", 3: "UNBOUNDED"}[res.status]
    assert cert.status == expected, (
        f"classify={cert.status} vs highs={res.status}")
    if cert.status == "INFEASIBLE":
        assert verify_farkas(A, b, l, u, cert.farkas_ray) > 0
    if cert.status == "UNBOUNDED":
        assert verify_ray(A, c, l, u, cert.unbounded_ray) > 0


# --------------------------------------------------------------------------
# end-to-end: solve_lp returns certified statuses with verifiable rays
# --------------------------------------------------------------------------
def _infeasible_glp():
    A = np.array([[1.0, 1.0, 0.5], [1.0, 1.0, 0.5]])
    b = np.array([1.0, 4.0])
    return GeneralLP(A=A, b=b, c=np.array([1.0, 2.0, 3.0]),
                     l=np.zeros(3), u=np.full(3, np.inf),
                     sense=np.array(["=", "="]))


def _unbounded_glp():
    A = np.array([[1.0, -1.0, 0.0], [0.0, 1.0, -1.0]])
    b = np.zeros(2)
    return GeneralLP(A=A, b=b, c=np.array([-1.0, 0.0, 0.0]),
                     l=np.full(3, -np.inf), u=np.full(3, np.inf),
                     sense=np.array(["=", "="]))


@pytest.mark.parametrize("method", ["barrier", "pdhg"])
def test_solve_lp_certifies_infeasible(method):
    glp = _infeasible_glp()
    out = solve_lp(glp, method=method,
                   settings=SolverSettings(presolve="off", certify="on",
                                           barrierMaxIters=60,
                                           firstOrderMaxIters=3000))
    assert out.status == "INFEASIBLE"
    assert out.farkas_ray is not None
    A_std = glp.get_standard_A()
    l_std, u_std = glp.get_standard_bounds()
    assert verify_farkas(A_std, glp.b, l_std, u_std, out.farkas_ray) > 0


def test_solve_lp_certifies_unbounded_barrier():
    glp = _unbounded_glp()
    out = solve_lp(glp, method="barrier",
                   settings=SolverSettings(presolve="off", certify="on",
                                           barrierMaxIters=60))
    assert out.status == "UNBOUNDED"
    assert out.unbounded_ray is not None
    # all-'=' LP: the sliced ray is a recession direction in original space
    assert verify_ray(glp.A, glp.c, glp.l, glp.u, out.unbounded_ray) > 0


def test_solve_lp_auto_certification_triggers():
    # default settings (certify='auto'): the diverging barrier on an
    # infeasible LP must still come back certified with a ray
    glp = _infeasible_glp()
    out = solve_lp(glp, method="barrier",
                   settings=SolverSettings(presolve="off",
                                           barrierMaxIters=60))
    assert out.status == "INFEASIBLE"
    if out.farkas_ray is not None:
        A_std = glp.get_standard_A()
        l_std, u_std = glp.get_standard_bounds()
        assert verify_farkas(A_std, glp.b, l_std, u_std, out.farkas_ray) > 0
