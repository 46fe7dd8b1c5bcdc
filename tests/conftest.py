"""Test harness config: 8 virtual CPU devices (the 'fake backend' the
reference never had — SURVEY.md §4) so sharding tests run anywhere."""

import os

# Force CPU: the shell environment pins JAX_PLATFORMS=axon (the real TPU),
# but unit tests need the 8-virtual-device CPU backend and fp32 matmuls.
# Set LRT_TEST_PLATFORM=axon to deliberately run the suite on hardware.
_platform = os.environ.get("LRT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env image force-registers the TPU plugin regardless of JAX_PLATFORMS;
# the config flag wins.
jax.config.update("jax_platforms", _platform)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
