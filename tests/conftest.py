"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count``) so they exercise real
``jax.sharding`` partitioning without TPU hardware.
"""

import os

# Hard override: the ambient environment may point JAX at a remote TPU
# (JAX_PLATFORMS=axon); unit tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Deterministic, highest-precision matmuls for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

# The ambient sitecustomize (remote-TPU PJRT plugin) imports jax at
# interpreter start, BEFORE this conftest runs — by then jax has already
# captured JAX_PLATFORMS=axon from the environment, so the env override
# above is not enough: pin the platform through the live config too
# (effective any time before first backend initialization).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
