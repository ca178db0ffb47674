from fishbirdeyevisualslam_tpu.ops import image, fast, orb, features, matcher  # noqa: F401
