from rivslam_tpu.loop import scancontext, detector, global_graph  # noqa: F401
