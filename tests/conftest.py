"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host-platform virtual devices
(XLA's --xla_force_host_platform_device_count), per the TPU-less CI model.
These env vars must be set before jax is first imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Force CPU via jax.config: the ambient sitecustomize imports jax and pins
# JAX_PLATFORMS to the TPU platform before conftest runs, so mutating
# os.environ here is too late — the config update is not.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
