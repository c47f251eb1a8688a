import numpy as np
import pytest
from scipy.optimize import linprog

from smart_crossover_tpu.models import GeneralLP, StandardLP
from smart_crossover_tpu.solvers.settings import SolverSettings
from smart_crossover_tpu.solvers.solving import solve_lp, solve_mcf, solve_ot
from tests.conftest import random_ot


def make_lp(rng, m=6, n=15):
    A = rng.standard_normal((m, n))
    b = A @ rng.uniform(0.2, 0.8, n)
    c = rng.standard_normal(n)
    return GeneralLP(A=A, b=b, c=c, l=np.zeros(n), u=np.ones(n),
                     sense=np.full(m, "="))


def highs(lp):
    res = linprog(lp.c, A_eq=np.asarray(lp.A), b_eq=lp.b,
                  bounds=[(lo, up) for lo, up in zip(lp.l, lp.u)],
                  method="highs")
    assert res.status == 0
    return res


def test_solve_lp_simplex_and_barrier_agree(rng):
    lp = make_lp(rng)
    ref = highs(lp)
    out_s = solve_lp(lp, method="simplex")
    out_b = solve_lp(lp, method="barrier")
    assert out_s.status == out_b.status == "OPTIMAL"
    assert out_s.obj_val == pytest.approx(ref.fun, abs=1e-7)
    assert out_b.obj_val == pytest.approx(ref.fun, abs=1e-6)
    # barrier with crossover returns both a vertex and the interior point
    assert out_b.basis is not None and out_b.x_bar is not None
    assert out_b.bar_iter_count > 0


def test_solve_lp_barrier_no_crossover(rng):
    lp = make_lp(rng)
    out = solve_lp(lp, method="barrier",
                   settings=SolverSettings(crossover="off"))
    assert out.status == "OPTIMAL"
    assert out.basis is None
    # interior point: strictly inside bounds
    assert np.all(out.x > lp.l) and np.all(out.x < lp.u)


def test_solve_lp_warm_start_basis(rng):
    lp = make_lp(rng)
    cold = solve_lp(lp, method="simplex")
    warm = solve_lp(lp, method="primal_simplex",
                    warm_start_basis=cold.basis)
    assert warm.status == "OPTIMAL"
    assert warm.iter_count <= 1
    assert warm.obj_val == pytest.approx(cold.obj_val, abs=1e-9)


def test_solve_standard_lp(rng):
    n = 10
    A = np.abs(rng.standard_normal((4, n))) + 0.1
    x0 = rng.uniform(0.1, 0.9, n)
    b = A @ x0
    lp = StandardLP(A=A, b=b, c=rng.standard_normal(n), u=np.ones(n))
    out = solve_lp(lp, method="simplex")
    ref = linprog(lp.c, A_eq=A, b_eq=b, bounds=[(0, 1)] * n, method="highs")
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(ref.fun, abs=1e-7)


def test_solve_mcf_and_ot(rng):
    ot = random_ot(rng, 6, 7)
    mcf = ot.to_MCF()
    out_ns = solve_mcf(mcf, method="network_simplex")
    out_ot = solve_ot(ot, method="default")
    assert out_ns.status == out_ot.status == "OPTIMAL"
    assert out_ns.obj_val == pytest.approx(out_ot.obj_val, abs=1e-9)
    ref = linprog(mcf.c, A_eq=mcf.A.toarray(), b_eq=mcf.b,
                  bounds=[(0, None)] * mcf.n, method="highs")
    assert out_ns.obj_val == pytest.approx(ref.fun, abs=1e-8)


def test_solve_mcf_barrier_gives_interior(rng):
    ot = random_ot(rng, 5, 5)
    mcf = ot.to_MCF()
    out = solve_mcf(mcf, method="barrier",
                    settings=SolverSettings(crossover="off", barrierTol=1e-8))
    assert out.status == "OPTIMAL"
    assert out.x_bar is not None
    np.testing.assert_allclose(mcf.A @ out.x_bar, mcf.b, atol=1e-6)


def test_solve_ot_sinkhorn_method(rng):
    ot = random_ot(rng, 6, 6)
    out = solve_ot(ot, method="sinkhorn",
                   settings=SolverSettings(sinkhornReg=0.01,
                                           firstOrderMaxIters=500))
    assert out.x is not None
    X = out.x.reshape(6, 6)
    np.testing.assert_allclose(X.sum(axis=1), ot.s, atol=1e-6)


def test_bad_backend_and_method(rng):
    lp = make_lp(rng)
    with pytest.raises(ValueError):
        solve_lp(lp, solver="NOPE")
    with pytest.raises(ValueError):
        solve_lp(lp, method="quantum")
    # vendor names map to the in-house backend for migration compatibility
    out = solve_lp(lp, solver="GRB", method="simplex")
    assert out.status == "OPTIMAL"


def test_log_file_written(rng, tmp_path):
    lp = make_lp(rng)
    logf = tmp_path / "solve.log"
    solve_lp(lp, method="simplex",
             settings=SolverSettings(log_file=str(logf)))
    text = logf.read_text()
    assert "simplex" in text and "OPTIMAL" in text and "obj_val=" in text


def test_analysis_plot_smoke(rng, tmp_path):
    from smart_crossover_tpu.analysis.plots import runtime_comparison_figure
    from smart_crossover_tpu.data import ResultStore

    store = ResultStore(tmp_path / "r.jsonl")
    for i in range(3):
        store.record(f"inst{i}", "tnet", runtime=0.1 * (i + 1),
                     status="OPTIMAL", rel_gap_vs_barrier=1e-9)
        store.record(f"inst{i}", "barrier_crossover", runtime=0.3 * (i + 1),
                     status="OPTIMAL")
    fig = runtime_comparison_figure(store, "tnet", "barrier_crossover",
                                    save_to=str(tmp_path / "fig.png"))
    assert (tmp_path / "fig.png").exists()


def test_solve_lp_dual_simplex_method(rng):
    lp = make_lp(rng)
    base = solve_lp(lp, method="simplex")
    lp2 = lp.copy()
    lp2.b = lp.b + 0.02
    out = solve_lp(lp2, method="dual_simplex", warm_start_basis=base.basis)
    ref = solve_lp(lp2, method="simplex")
    if ref.status == "OPTIMAL":
        assert out.status == "OPTIMAL"
        assert out.obj_val == pytest.approx(ref.obj_val, abs=1e-7)


def test_solve_ot_device_simplex_method(rng):
    ot = random_ot(rng, 8, 9)
    out = solve_ot(ot, method="device_simplex",
                   settings=SolverSettings(sinkhornReg=0.01))
    ref = solve_ot(ot, method="network_simplex")
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(ref.obj_val, abs=1e-7)


def test_solve_lp_barrier_perturb_method(rng):
    """method='barrier_perturb' routes through the perturbation crossover
    and returns an exactly-optimal vertex (cross-checked against HiGHS)."""
    from scipy.optimize import linprog

    from smart_crossover_tpu.data.lp_gen import random_sparse_lp

    lp = random_sparse_lp(m=40, n=160, seed=17)
    out = solve_lp(lp, method="barrier_perturb")
    assert out.status == "OPTIMAL"
    A = lp.get_standard_A()
    nsl = A.shape[1] - lp.c.size
    ref = linprog(lp.get_standard_c(), A_eq=A, b_eq=lp.b,
                  bounds=[(li if np.isfinite(li) else None,
                           ui if np.isfinite(ui) else None)
                          for li, ui in zip(
                              np.concatenate([lp.l, np.zeros(nsl)]),
                              np.concatenate([lp.u, np.full(nsl, np.inf)]))],
                  method="highs")
    assert out.obj_val == pytest.approx(ref.fun, abs=1e-7)


def test_barrier_perturb_applies_obj_offset_once(rng):
    """run_perturb_algorithm adds obj_offset internally; the facade must not
    add it a second time."""
    import dataclasses

    from smart_crossover_tpu.data.lp_gen import random_sparse_lp

    lp = random_sparse_lp(m=30, n=120, seed=19)
    base = solve_lp(lp, method="barrier_perturb")
    shifted = solve_lp(dataclasses.replace(lp, obj_offset=5.0),
                       method="barrier_perturb")
    assert base.status == "OPTIMAL" and shifted.status == "OPTIMAL"
    assert shifted.obj_val == pytest.approx(base.obj_val + 5.0, abs=1e-7)


def test_barrier_perturb_feasibility_problem_falls_back(rng):
    """c == 0 (pure feasibility): the perturbed subproblem can be unbounded
    on the estimated face; the method must still return an exact vertex via
    the warm-simplex fallback."""
    import dataclasses

    from smart_crossover_tpu.data.lp_gen import random_sparse_lp

    lp = random_sparse_lp(m=25, n=100, seed=23)
    lp = dataclasses.replace(lp, c=np.zeros_like(lp.c))
    out = solve_lp(lp, method="barrier_perturb")
    assert out.status == "OPTIMAL"
    assert out.obj_val == pytest.approx(0.0, abs=1e-9)


def test_solve_lp_rejects_nonfinite_data(rng):
    import dataclasses

    import scipy.sparse as sp

    lp = GeneralLP(A=sp.csr_matrix(np.array([[1.0, 1.0]])), b=np.ones(1),
                   c=np.ones(2), l=np.zeros(2), u=np.full(2, np.inf),
                   sense=np.array(["="]))
    assert solve_lp(lp, method="barrier").status == "OPTIMAL"
    with pytest.raises(ValueError, match="NaN/inf"):
        solve_lp(dataclasses.replace(lp, c=np.array([1.0, np.nan])),
                 method="barrier")
    with pytest.raises(ValueError, match="NaN/inf"):
        solve_lp(dataclasses.replace(lp, b=np.array([np.inf])),
                 method="simplex")
    with pytest.raises(ValueError, match="NaN"):
        solve_lp(dataclasses.replace(lp, l=np.array([np.nan, 0.0])),
                 method="barrier")
