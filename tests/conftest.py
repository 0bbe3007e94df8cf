"""Test configuration: 8 virtual CPU devices, x64 available.

Multi-device sharding tests run without a pod via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4e).  The env mangling
must happen before jax initializes a backend, hence module scope here.
"""

import os

# "0"/"false" must mean OFF (bool("0") is True — a footgun that would
# silently point the whole suite at the minutes-slow tunneled TPU).
ON_TPU = os.environ.get("TESTS_ON_TPU", "") not in ("", "0", "false",
                                                    "False")

if not ON_TPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if not ON_TPU:
    # Default: virtual 8-device CPU mesh, x64 oracles.  Set TESTS_ON_TPU=1
    # to run the hardware suite (tests/test_tpu_hardware.py) on a real chip
    # instead (f32; x64 is unsupported on TPU).
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
