"""rivslam_tpu — TPU-native 4D radar-inertial SLAM engine (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of Wayne-DWA/RIV-SLAM
(reference mounted at /root/reference) for TPU hardware:

- point clouds are fixed-capacity masked arrays (``core.pointcloud``),
- kd-trees are replaced by MXU-friendly brute-force / tiled top-k searches
  (``ops.knn``),
- APDGICP scan matching is a batched Gauss-Newton/LM kernel under ``jit``
  (``frontend.apdgicp``),
- the radar ego-velocity RANSAC is one vectorized solve (``frontend.reve``),
- the g2o sliding-window pose graph becomes a dense-on-window factor-graph
  nonlinear least squares on SE(3) (``factors``, ``solver``),
- loop closure uses scatter-built intensity scan-context descriptors and
  batched shift-search (``loop``),
- multi-chip scaling goes through ``jax.sharding`` meshes (``dist``).

Layer map mirrors SURVEY.md §7.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU MXUs execute f32 matmuls as single-pass bfloat16 by default
# (jax_default_matmul_precision=None). That is catastrophic for this
# workload: every 4x4 pose product injects ~1e-3 relative error, so chained
# odometry rotations drift off SO(3) at ~0.2% det per frame (exponential
# blow-up through the keyframe chain), NN distance matrices lose the
# cancellation headroom |p|^2+|t|^2-2p.t needs at 30 m coordinate scale,
# and covariance moments (sum_xx/n - mean^2) cancel below the noise.
# Forcing f32 costs ~39% registration throughput on v5e (bench.py:
# 5415 -> 3289 fps, still 22x the measured CPU baseline) and halves the
# registration error to f64-CPU parity (0.07 -> 0.038 m median on the
# radar-realistic course). Override with RIVSLAM_MATMUL_PRECISION
# (e.g. "bfloat16" to restore the fast path for experiments). An embedding
# program that already configured its own default precision is respected.
if _os.environ.get("RIVSLAM_MATMUL_PRECISION"):
    _jax.config.update(
        "jax_default_matmul_precision", _os.environ["RIVSLAM_MATMUL_PRECISION"]
    )
elif _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache for every entry point (CLI, eval harnesses,
# bench) — first compiles of the fused frame step / batched loop verify are
# tens of seconds through the axon relay; cached reloads are milliseconds.
# As with the precision knob above, an embedding program that already
# configured its own compilation cache is respected — import must not
# clobber a host application's cache setup.
if _os.environ.get("RIVSLAM_JAX_CACHE"):
    _jax.config.update(
        "jax_compilation_cache_dir", _os.environ["RIVSLAM_JAX_CACHE"]
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
elif _jax.config.jax_compilation_cache_dir is None:
    _repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    _cache_dir = _os.path.join(_repo_root, ".jax_cache")
    # pip-installed: never write into site-packages — use the user cache
    if "site-packages" in _repo_root or "dist-packages" in _repo_root or not _os.access(
        _repo_root, _os.W_OK
    ):
        _cache_dir = _os.path.join(
            _os.path.expanduser("~"), ".cache", "rivslam_tpu", "jax_cache"
        )
    # partition by host-CPU fingerprint: XLA:CPU cache entries embed AOT
    # machine code for the compiling host's exact feature set, and loading
    # one on a different microarch can abort the process (observed SIGILL /
    # hard abort when the same shared cache served two CI boxes)
    import hashlib as _hashlib
    import platform as _platform

    # hash the model name TOO, not just the flags line: LLVM tuning
    # features baked into AOT code (prefer-no-scatter/-gather, AMX subsets)
    # derive from the CPU model, so two hosts with identical cpuinfo flags
    # can still produce incompatible AOT entries (observed as
    # cpu_aot_loader "machine type doesn't match" errors)
    try:
        with open("/proc/cpuinfo") as _f:
            _lines = [
                _l for _l in _f
                if _l.startswith("flags") or _l.startswith("model name")
            ]
            _fp_src = "".join(sorted(set(_lines))) or _platform.machine()
    except OSError:
        _fp_src = _platform.machine()
    _cache_dir = _os.path.join(
        _cache_dir, _hashlib.sha1(_fp_src.encode()).hexdigest()[:12]
    )
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _patch_atomic_cache_writes() -> None:
    """Make persistent-cache writes atomic (tmp + os.replace).

    jax's LRUCache.put writes entries with a bare ``cache_path.write_bytes``
    and takes NO lock unless eviction is enabled — a concurrent reader (e.g.
    another pytest-xdist worker or a process-fleet replay sharing this
    repo's cache) can read a partially-written entry, and deserializing the
    truncated executable segfaults the process (observed repeatedly as
    xdist 'node down' crashes inside compilation_cache.get_executable_and
    _time during concurrent cold builds). Writing to a unique temp file in
    the same directory and renaming over the final name guarantees readers
    only ever see complete entries. Best-effort: silently skips if jax
    internals move."""
    try:
        from jax._src import lru_cache as _lru
    except Exception:
        return
    if getattr(_lru.LRUCache.put, "_rivslam_atomic", False):
        return

    def _atomic_put(self, key, val):
        if not key:
            raise ValueError("key cannot be empty")
        if self.eviction_enabled and len(val) > self.max_size:
            return
        cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
        if self.eviction_enabled:
            self.lock.acquire(timeout=self.lock_timeout_secs)
        try:
            if cache_path.exists():
                return
            self._evict_if_needed(additional_size=len(val))
            tmp = self.path / f".{key}.{_os.getpid()}.tmp"
            tmp.write_bytes(val)
            _os.replace(tmp, cache_path)
            if self.eviction_enabled:
                import time as _time

                timestamp = _time.time_ns().to_bytes(8, "little")
                (self.path / f"{key}{_lru._ATIME_SUFFIX}").write_bytes(timestamp)
        finally:
            if self.eviction_enabled:
                self.lock.release()

    _atomic_put._rivslam_atomic = True
    _lru.LRUCache.put = _atomic_put


_patch_atomic_cache_writes()

from rivslam_tpu.core import lie  # noqa: F401
