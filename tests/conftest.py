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
# (including the driver's) reuse kernels across processes.
# The cache is partitioned by a host-CPU fingerprint: XLA:CPU stores AOT
# machine code compiled for the build host's exact feature set, and loading
# an entry from a different microarch aborts the process ("Machine type used
# for XLA:CPU compilation doesn't match ... could lead to execution errors
# such as SIGILL" — observed as a hard xdist worker crash mid-suite when the
# CI box changed). Same machine -> same subdir -> stays warm.
import hashlib  # noqa: E402
import platform  # noqa: E402

try:
    # flags + model name: LLVM tuning features in AOT entries
    # (prefer-no-scatter etc.) vary by CPU model even at identical flags
    with open("/proc/cpuinfo") as _f:
        _lines = [l for l in _f if l.startswith(("flags", "model name"))]
    _fp_src = "".join(sorted(set(_lines))) or platform.machine()
except OSError:
    _fp_src = platform.machine()
_fp = hashlib.sha1(_fp_src.encode()).hexdigest()[:12]
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache", _fp
)
# RIVSLAM_TEST_NO_CACHE=1 runs the suite without the persistent cache —
# the escape hatch while jaxlib's (de)serialization segfaults are live
# (see test_scaling.py's fixture for the always-crashy case)
if os.environ.get("RIVSLAM_TEST_NO_CACHE"):
    _cache_dir = None
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
