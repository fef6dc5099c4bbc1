from rivslam_tpu.frontend import reve, apdgicp, odometry, floor  # noqa: F401
