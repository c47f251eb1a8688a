"""LP scenario sweeps over the fleet barrier."""
import numpy as np


def test_lp_scenario_sweep_matches_highs(rng):
    """One LP, K RHS scenarios through the fleet barrier (and the exact-
    vertex variant) must match per-scenario HiGHS."""
    from scipy.optimize import linprog

    from smart_crossover_tpu.parallel.scenarios import lp_scenario_sweep

    m, n, K = 8, 20, 5
    A = rng.standard_normal((m, n))
    xs = rng.uniform(0.2, 0.8, (K, n))
    b_sc = np.einsum("mn,kn->km", A, xs)
    c = A.T @ rng.standard_normal(m) + np.abs(rng.standard_normal(n)) + 0.05
    l = np.zeros(n)
    u = np.ones(n)
    out = lp_scenario_sweep(A, b_sc[0], c, l, u, b_scenarios=b_sc)
    outv = lp_scenario_sweep(A, b_sc[0], c, l, u, b_scenarios=b_sc,
                             exact_vertices=True)
    assert all(s == "OPTIMAL" for s in out["status"])
    assert outv["optimal"].all()
    for k in range(K):
        ref = linprog(c, A_eq=A, b_eq=b_sc[k], bounds=[(0, 1)] * n,
                      method="highs")
        assert abs(out["obj"][k] - ref.fun) < 1e-6 * (1 + abs(ref.fun))
        assert abs(outv["obj"][k] - ref.fun) < 1e-7 * (1 + abs(ref.fun))


def test_lp_scenario_sweep_mesh_sharded(rng):
    """The mesh kwarg shards the fleet device stage over the batch axis;
    results must be identical (same objective vs HiGHS) to the unsharded
    path."""
    from scipy.optimize import linprog

    from smart_crossover_tpu.parallel.mesh import make_mesh
    from smart_crossover_tpu.parallel.scenarios import lp_scenario_sweep

    m, n, K = 6, 16, 8
    A = rng.standard_normal((m, n))
    xs = rng.uniform(0.2, 0.8, (K, n))
    b_sc = np.einsum("mn,kn->km", A, xs)
    c = A.T @ rng.standard_normal(m) + np.abs(rng.standard_normal(n)) + 0.05
    mesh = make_mesh(n_batch=8, n_model=1)
    out = lp_scenario_sweep(A, b_sc[0], c, np.zeros(n), np.ones(n),
                            b_scenarios=b_sc, mesh=mesh)
    assert all(s == "OPTIMAL" for s in out["status"])
    for k in range(K):
        ref = linprog(c, A_eq=A, b_eq=b_sc[k], bounds=[(0, 1)] * n,
                      method="highs")
        assert abs(out["obj"][k] - ref.fun) < 1e-6 * (1 + abs(ref.fun))
