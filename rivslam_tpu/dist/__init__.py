from rivslam_tpu.dist import mesh, dist_gn  # noqa: F401
