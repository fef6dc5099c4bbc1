from rivslam_tpu.backend import slam  # noqa: F401
