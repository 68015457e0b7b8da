"""Test env: force JAX onto a virtual 8-device CPU mesh (no TPU needed in CI).

The container's sitecustomize imports jax and registers the TPU backend
before pytest starts, so setting ``JAX_PLATFORMS`` in the environment here
is too late — use ``jax.config.update`` instead (backends initialize
lazily, so this still wins as long as no device was touched yet).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_joints_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
