from rivslam_tpu.io import synthetic, tum, datasets, checkpoint, rosbag1  # noqa: F401
