from rivslam_tpu.solver import window  # noqa: F401
