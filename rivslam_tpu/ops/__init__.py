from rivslam_tpu.ops import knn, voxel, filters, deskew  # noqa: F401
