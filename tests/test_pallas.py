import numpy as np
import pytest

from smart_crossover_tpu.ops.sinkhorn_pallas import (
    pallas_shapes_ok,
    sinkhorn_plan_pallas,
)
from smart_crossover_tpu.solvers.sinkhorn import (
    plan_from_potentials,
    sinkhorn_potentials,
)


def make_batch(rng, B=3, S=16, D=16, dtype=np.float64):
    s = rng.uniform(0.5, 2.0, (B, S)).astype(dtype)
    d = rng.uniform(0.5, 2.0, (B, D)).astype(dtype)
    d *= (s.sum(axis=1) / d.sum(axis=1))[:, None]
    M = rng.uniform(0.0, 5.0, (B, S, D)).astype(dtype)
    return s, d, M


def test_pallas_sinkhorn_matches_xla(rng):
    s, d, M = make_batch(rng)
    reg = 0.5
    # interpret mode on CPU
    plans = np.asarray(sinkhorn_plan_pallas(s, d, M, reg, num_iters=100))
    for b in range(s.shape[0]):
        f, g = sinkhorn_potentials(s[b], d[b], M[b], reg, num_iters=100)
        want = np.asarray(plan_from_potentials(f, g, M[b], reg))
        np.testing.assert_allclose(plans[b], want, rtol=1e-10, atol=1e-12)


def test_pallas_sinkhorn_marginals(rng):
    s, d, M = make_batch(rng, B=2, S=8, D=24)
    plans = np.asarray(sinkhorn_plan_pallas(s, d, M, 0.3, num_iters=800))
    # after the g-update the column marginals are exact
    np.testing.assert_allclose(plans.sum(axis=1), d, atol=1e-10)
    np.testing.assert_allclose(plans.sum(axis=2), s, atol=1e-3)


def test_pallas_shape_gate():
    assert pallas_shapes_ok(256, 256)
    assert not pallas_shapes_ok(100, 256)     # sublane misaligned
    assert not pallas_shapes_ok(256, 100)     # lane misaligned
    assert not pallas_shapes_ok(2048, 2048)   # VMEM budget
