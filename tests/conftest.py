"""Test config: run all tests on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (a remote-TPU tunnel with remote compile). Env vars set
here are therefore too late — jax.config already baked them in — so we
update jax.config directly (backends have not initialized yet at conftest
import time). XLA_FLAGS is read by the C++ backend at first use, so the env
route still works for the virtual device count.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# determinism + fp32 matmuls on CPU for parity tests
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
