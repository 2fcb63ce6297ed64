"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (see repo instructions); the real
TPU path is exercised by bench.py / __graft_entry__.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin imports jax before this conftest runs, so the env var
# alone is too late; override through the config API (effective as long as no
# backend has been initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
