from rivslam_tpu.eval import ate, timing, viz  # noqa: F401
