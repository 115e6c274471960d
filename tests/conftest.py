"""Test config: force an 8-virtual-device CPU backend before jax imports.

This is the idiomatic JAX fake-backend trick for exercising pjit/shard_map
multi-chip code paths without TPU hardware (see SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The env var alone is not honored when a TPU platform plugin (axon) is
# installed — pin the platform through jax.config as well.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
