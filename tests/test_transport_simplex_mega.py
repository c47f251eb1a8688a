"""Pallas megakernel transportation simplex vs the anc-engine oracle.

Runs in interpreter mode on the CPU backend (conftest); the Mosaic
compile path is exercised on the real chip by scripts/bench_device_simplex
and the driver's bench run.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from smart_crossover_tpu.ops.transport_simplex_anc import (
    transport_simplex_anc,
)
from smart_crossover_tpu.ops.transport_simplex_mega import (
    batched_transport_simplex_mega,
)


def _nw_corner(S, D, seed):
    """Northwest-corner basic feasible plan + spanning basis mask."""
    rng = np.random.default_rng(seed)
    M = rng.uniform(0, 1, (S, D)).astype(np.float32)
    s = rng.uniform(0.5, 1.5, S)
    s /= s.sum()
    d = rng.uniform(0.5, 1.5, D)
    d /= d.sum()
    X = np.zeros((S, D), np.float32)
    Bm = np.zeros((S, D), bool)
    si, dj = s.copy(), d.copy()
    i = j = 0
    while i < S and j < D:
        t = min(si[i], dj[j])
        X[i, j] = t
        Bm[i, j] = True
        si[i] -= t
        dj[j] -= t
        if si[i] <= 1e-15 and i < S - 1:
            i += 1
        elif dj[j] <= 1e-15 and j < D - 1:
            j += 1
        else:
            break
    assert Bm.sum() == S + D - 1
    return X, Bm, M, s.astype(np.float32), d.astype(np.float32)


@pytest.mark.parametrize("shape", [(16, 16), (24, 40), (48, 24)])
def test_mega_matches_anc(shape):
    S, D = shape
    batch = [_nw_corner(S, D, k) for k in range(3)]
    X = np.stack([b[0] for b in batch])
    Bm = np.stack([b[1] for b in batch])
    M = np.stack([b[2] for b in batch])
    Xm, Bmm, piv, opt = batched_transport_simplex_mega(
        X, Bm, M, max_pivots=2000, refresh=64)
    Xm = np.asarray(Xm)
    for k, (Xk, Bmk, Mk, sk, dk) in enumerate(batch):
        assert bool(opt[k])
        Xa, _, pa, oa = transport_simplex_anc(
            jnp.array(Xk), jnp.array(Bmk), jnp.array(Mk), None, None,
            max_pivots=2000)
        obj_m = float((Xm[k] * Mk).sum())
        obj_a = float((np.asarray(Xa) * Mk).sum())
        assert abs(obj_m - obj_a) <= 1e-5 * (1 + abs(obj_a))
        # identical pivot trajectory (same Dantzig/Bland tie-breaks)
        assert int(piv[k]) == int(pa)
        np.testing.assert_allclose(Xm[k].sum(1), sk, atol=2e-5)
        np.testing.assert_allclose(Xm[k].sum(0), dk, atol=2e-5)
        # returned basis is spanning (S+D-1 arcs) in the real region
        assert np.asarray(Bmm[k]).sum() == S + D - 1


def test_mega_via_exact_pipeline():
    from smart_crossover_tpu.parallel import batched_tnet_exact

    rng = np.random.default_rng(7)
    B, S, D = 2, 24, 24
    s = rng.uniform(0.5, 1.5, (B, S)).astype(np.float32)
    s /= s.sum(1, keepdims=True)
    d = rng.uniform(0.5, 1.5, (B, D)).astype(np.float32)
    d /= d.sum(1, keepdims=True)
    M = rng.uniform(0, 1, (B, S, D)).astype(np.float32)
    Xh, objh, pivh, okh = batched_tnet_exact(s, d, M, engine="host",
                                             sinkhorn_iters=200)
    Xm, objm, pivm, okm = batched_tnet_exact(s, d, M, engine="mega",
                                             sinkhorn_iters=200)
    assert okh.all() and okm.all()
    np.testing.assert_allclose(objm, objh, rtol=1e-6, atol=1e-9)


def test_mega_small_row_block_matches(monkeypatch):
    """The RB=64 row-block variant (used for V > 1024 where the RB=128
    kernel exceeds Mosaic's spill budget) must produce identical results;
    forced here at a small size via the spill-cap knob."""
    import smart_crossover_tpu.ops.transport_simplex_mega as mega

    monkeypatch.setattr(mega, "_RB_SPILL_CAP_V", 0)   # always pick RB=64
    S, D = 24, 40
    X, Bm, M, s, d = _nw_corner(S, D, 5)
    Xo, Bmo, piv, opt = mega.transport_simplex_mega(
        jnp.asarray(X), jnp.asarray(Bm), jnp.asarray(M),
        max_pivots=4000)
    assert bool(opt)
    from smart_crossover_tpu.ops.transport_simplex_anc import (
        transport_simplex_anc,
    )
    Xa, _, _, opta = transport_simplex_anc(
        jnp.asarray(X), jnp.asarray(Bm), jnp.asarray(M),
        jnp.asarray(s), jnp.asarray(d), max_pivots=4000)
    assert bool(opta)
    np.testing.assert_allclose(float((Xo * M).sum()),
                               float((Xa * M).sum()), rtol=1e-5)
