"""Test harness: force an 8-fake-device CPU platform (the standard JAX way to
test pjit/shard_map sharding without a pod — SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# the environment pre-seeds jax_platforms with the TPU plugin; force CPU here so
# unit tests never grab (or block on) the real chip
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
assert jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
