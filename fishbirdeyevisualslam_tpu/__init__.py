"""fishbirdeyevisualslam_tpu — a TPU-native dual-view (front fisheye + bird's-eye IPM)
monocular SLAM framework built on JAX / XLA / Pallas / pjit.

Re-implements, TPU-first, the capabilities of the C++ reference
``JingruiYu/FishBirdEyeVisualSLAM`` (ORB-SLAM2 fork fusing a front fisheye camera,
a metric bird's-eye surround view, and wheel odometry):

- ``geometry``  — SE3/Sim3/SE2 Lie ops, fisheye camera model, IPM bird-view mappings.
- ``ops``       — feature kernels: image pyramid, FAST, rBRIEF, Hamming matching
                  (bit-matmul on the MXU), BoW vocabulary scoring.
- ``solvers``   — batched Levenberg-Marquardt: pose optimization, local/global BA with
                  sparse Schur complement, Sim3/SE3 pose graph, EPnP/Horn RANSAC.
- ``slam``      — functional map state (struct-of-arrays), tracking state machine,
                  local mapping, loop closing, system facade.
- ``parallel``  — device-mesh sharded global BA (shard_map + psum over ICI).
- ``io``        — dataset loading, TUM trajectory export, ATE evaluation.

Everything on the device path is fixed-shape, mask-correct, and jit-compatible.
"""

__version__ = "0.1.0"

from fishbirdeyevisualslam_tpu.config import SystemConfig  # noqa: F401
