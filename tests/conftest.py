"""Test harness: force an 8-device virtual CPU mesh.

The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (remote
TPU tunnel), so env vars are too late — we flip the live config instead,
before any backend is initialized. Multi-chip sharding paths are validated on
host devices; TPU hardware runs happen only through bench.py / the driver.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the suite is compile-dominated; repeat runs
# (including the driver's) reuse kernels across processes
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
