"""Device offload of the IPM's dense normal-equations formation.

For mid-size LPs the host cost of one Mehrotra iteration splits between
forming ``M = A diag(d) A'`` (a sparse matmat that fills in almost
completely — ~1 s at 3000x12000 on the host) and factoring it.  The
FORMATION is a pure GEMM: with A resident on the TPU once per solve,
each iteration ships only d (n floats) down and M (m^2 f32) back, and
the MXU does the 2 m^2 n flops in milliseconds.

Accuracy contract: the product is f32 (HIGHEST, 6-pass) — relative entry
error ~1e-7.  The IPM tolerates an inexact Newton SYSTEM (residuals are
recomputed exactly on the host every iteration), but the ENDGAME wants
exact normal equations, so callers use the device only while mu > 1e-6
and switch to the host path afterwards (`ipm_solve` wiring).

Opt-in: requires a TPU backend AND SCX_NE_OFFLOAD=1 (the relay in this
environment adds ~30 ms per call, so the win only materialises for
m >= ~1500 where the host matmat costs hundreds of ms).
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np

from smart_crossover_tpu.config import on_tpu

_MAX_BYTES = 2 << 30    # device A buffer cap


def _enabled() -> bool:
    return on_tpu() and os.environ.get("SCX_NE_OFFLOAD") == "1"


class DeviceNE:
    """Keeps dense f32 A on the device; forms A diag(d) A' per call."""

    def __init__(self, A_csr):
        import jax
        import jax.numpy as jnp

        m, n = A_csr.shape
        self.shape = (m, n)
        A = np.asarray(A_csr.todense(), dtype=np.float32)
        self._A = jax.device_put(A)

        @partial(jax.jit, donate_argnums=())
        def form(A_, d_):
            Ad = A_ * d_[None, :]
            return jax.lax.dot_general(
                Ad, A_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        self._form = form

    def form(self, d: np.ndarray) -> np.ndarray:
        """M = A diag(d) A' as a dense f64 host array (f32 accuracy)."""
        import jax.numpy as jnp

        M = self._form(self._A, jnp.asarray(d, jnp.float32))
        return np.asarray(M, dtype=np.float64)


def maybe_device_ne(A_csr) -> DeviceNE | None:
    """A DeviceNE for this matrix, or None when ineligible/disabled."""
    if not _enabled():
        return None
    m, n = A_csr.shape
    if m > 4096 or 4 * m * n > _MAX_BYTES or m < 1024:
        return None
    try:
        return DeviceNE(A_csr)
    except Exception:   # device OOM / wedged relay: never block the solve
        return None
