"""Precision / platform policy for the TPU-native crossover framework.

The reference codebase (smart-crossover) runs everything in float64 on the host
and delegates exact pivoting to commercial solvers.  On TPU, float64 is not a
native dtype, so this framework splits the numerics:

* approximate, massively-parallel work (Sinkhorn, PDHG, flow ranking, MST,
  tree push) runs in the *device* dtype — float32 on TPU, float64 on CPU when
  x64 is enabled;
* exactness-critical cleanup (simplex pivots, optimality certificates) runs on
  the host in float64 (numpy / native C++).

Use :func:`device_float` wherever a JAX kernel needs a dtype and
:data:`HOST_FLOAT` for host-side exact arithmetic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HOST_FLOAT = np.float64
HOST_INT = np.int64


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def device_float():
    """Float dtype for JAX device computation (f64 iff x64 is enabled)."""
    return jnp.float64 if x64_enabled() else jnp.float32


def device_int():
    return jnp.int64 if x64_enabled() else jnp.int32


def default_backend() -> str:
    return jax.default_backend()


def on_tpu() -> bool:
    return default_backend() == "tpu"


def interpret_pallas() -> bool:
    """Whether Pallas kernels should run in interpreter mode (non-TPU backends)."""
    return not on_tpu()
