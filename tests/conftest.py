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
# NO persistent compilation cache on the CPU backend: XLA:CPU serializes
# AOT executables pinned to the compiling host's CPU features, and this
# CI can move between hosts — a mismatched entry warns "may SIGILL" on
# load, and the cache writer itself was observed segfaulting mid-suite
# (jax compilation_cache.put_executable_and_time). CPU compiles are cheap;
# only the TPU entry points (bench.py, __graft_entry__) keep the cache.

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
