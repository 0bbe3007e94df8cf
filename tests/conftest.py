"""Test configuration: 8 virtual CPU devices, x64 available.

Multi-device sharding tests run without a pod via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4e).  The env mangling
must happen before jax initializes a backend, hence module scope here.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(0)
