from fishbirdeyevisualslam_tpu.geometry import se3, sim3, camera, ipm, odometry  # noqa: F401
