import os

# Force CPU with 8 virtual devices so multi-chip sharding paths are testable
# without TPU hardware; enable x64 so tolerances match the reference's 1e-8.
#
# NOTE: the environment's sitecustomize may have already imported jax and
# registered a TPU plugin, so env vars alone are too late — use
# jax.config.update before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def random_ot(rng, ns=7, nd=9):
    s = rng.uniform(0.5, 2.0, ns)
    d = rng.uniform(0.5, 2.0, nd)
    d *= s.sum() / d.sum()
    M = rng.uniform(0.0, 5.0, (ns, nd))
    from smart_crossover_tpu.models import OptTransport

    return OptTransport(s=s, d=d, M=M)


@pytest.fixture
def small_ot(rng):
    return random_ot(rng)
