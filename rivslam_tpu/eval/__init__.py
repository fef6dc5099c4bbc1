from rivslam_tpu.eval import ate  # noqa: F401
