from fishbirdeyevisualslam_tpu.solvers import (  # noqa: F401
    pose_opt,
    triangulate,
)
