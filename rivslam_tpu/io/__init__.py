from rivslam_tpu.io import synthetic, tum  # noqa: F401
