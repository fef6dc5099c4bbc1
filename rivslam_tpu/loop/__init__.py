from rivslam_tpu.loop import scancontext, detector, global_graph, block_schur  # noqa: F401
