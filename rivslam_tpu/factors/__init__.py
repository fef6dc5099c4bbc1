from rivslam_tpu.factors import preintegration, residuals, robust, infomat  # noqa: F401
