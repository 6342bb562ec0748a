"""Test configuration: force CPU backend with 8 virtual devices so that
multi-chip sharding tests run without TPU hardware."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the environment's sitecustomize imports jax at interpreter startup, before
# this conftest — env vars alone are too late, force via the config
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20211202)
