from rivslam_tpu.core import lie, navstate, pointcloud, config  # noqa: F401
