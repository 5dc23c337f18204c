"""Test harness config: force an 8-device virtual CPU mesh before jax loads.

Multi-chip sharding paths are validated on CPU via
``--xla_force_host_platform_device_count`` (no TPU pod needed); bench.py runs
on the real chip instead.
"""

import os

# Must happen before any jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The axon TPU plugin overrides JAX_PLATFORMS; the config knob wins.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, "tests expect the 8-device virtual CPU mesh"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
