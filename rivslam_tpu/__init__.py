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

from rivslam_tpu.core import lie  # noqa: F401
