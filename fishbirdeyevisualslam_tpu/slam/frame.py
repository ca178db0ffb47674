"""Per-frame perception: dual-view feature extraction + geometry.

The TPU-native analog of the dual-view ``Frame`` constructor
(``src/Frame.cc:262-379``): front ORB on the fisheye image + keypoint
undistortion, bird ORB on the IPM image restricted to the freespace mask and the
contour neighborhood (``GuidenceKeyBirdPts``, ``Frame.cc:671-739``), and metric
back-projection of every bird keypoint to the vehicle base plane and the front
camera frame (``Frame.cc:363-373``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import camera as cam_ops
from fishbirdeyevisualslam_tpu.geometry import ipm
from fishbirdeyevisualslam_tpu.ops import features, orb


class Frame(NamedTuple):
    # front view
    uv_raw: jnp.ndarray      # (F, 2) distorted pixel coords
    uv: jnp.ndarray          # (F, 2) undistorted
    octave: jnp.ndarray      # (F,) int32
    angle: jnp.ndarray       # (F,)
    desc: jnp.ndarray        # (F, 8) uint32
    desc_pm1: jnp.ndarray    # (F, 256) bf16
    kp_valid: jnp.ndarray    # (F,) bool
    # bird view
    bird_uv: jnp.ndarray     # (FB, 2) bird-image pixels
    bird_octave: jnp.ndarray # (FB,) int32
    bird_desc: jnp.ndarray   # (FB, 8) uint32
    bird_desc_pm1: jnp.ndarray  # (FB, 256) bf16
    bird_kp_valid: jnp.ndarray  # (FB,) bool
    bird_base: jnp.ndarray   # (FB, 3) vehicle-base ground points (z=0)
    bird_cam: jnp.ndarray    # (FB, 3) camera-frame metric points
    # odometry + bookkeeping
    odom: jnp.ndarray        # (3,)
    timestamp: jnp.ndarray   # ()


def bird_detection_mask(freespace_mask, contour, dilate: int = 3):
    """Keypoints are kept only on freespace AND near labeled contour edges
    (label < 150 = edge in ``birdviewContourICP``, ``Frame.cc:690-707``).
    The reference's per-keypoint ``nearEdges`` search becomes a min-pool
    dilation of the edge map."""
    edge = (contour < 150.0) & (freespace_mask > 0)
    k = 2 * dilate + 1
    near = jax.lax.reduce_window(
        edge.astype(jnp.float32), 0.0, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return (freespace_mask > 0) & (near > 0)


@functools.partial(jax.jit, static_argnums=(5, 6, 8))
def build_frame(
    front_gray,
    bird_gray,
    bird_mask,       # (HB, WB) float/bool freespace mask (already eroded/blanked)
    odom,
    timestamp,
    cfg: SystemConfig,
    n_features: int,
    contour=None,    # (HB, WB) contour label image (edge < 150), optional
    n_bird_features: int = 0,   # 0 -> same as n_features
) -> Frame:
    orbc = cfg.orb
    # bird keypoints restricted to freespace; with a contour label image also
    # to the contour neighborhood (``GuidenceKeyBirdPts``, ``Frame.cc:671-739``)
    det_mask = bird_mask > 0
    if contour is not None:
        det_mask = bird_detection_mask(bird_mask, contour)
    # both views share ONE orientation + rBRIEF-sampler pipeline (r5 perf:
    # the (2048, 1369)x(1369, 8192) descriptor matmul ran once per view)
    kp, bkp = features.extract_dual(
        front_gray, bird_gray, orbc, n_features,
        n_bird_features or n_features, mask_b=det_mask)
    uv_und = cam_ops.undistort_fisheye(cfg.camera, kp.xy)
    uv_und = jnp.where(kp.valid[:, None], uv_und, 0.0)
    base = ipm.bird_pixel_to_base_xy(cfg.bird, bkp.xy)
    cam = ipm.base_xyz_to_cam(cfg.extrinsics, base)

    return Frame(
        uv_raw=kp.xy,
        uv=uv_und,
        octave=kp.level,
        angle=kp.angle,
        desc=kp.desc,
        desc_pm1=kp.desc_pm1,
        kp_valid=kp.valid,
        bird_uv=bkp.xy,
        bird_octave=bkp.level,
        bird_desc=bkp.desc,
        bird_desc_pm1=bkp.desc_pm1,
        bird_kp_valid=bkp.valid,
        bird_base=base,
        bird_cam=cam,
        odom=odom,
        timestamp=timestamp,
    )


def inv_level_sigma2_lut(cfg: SystemConfig):
    return jnp.asarray(cfg.orb.inv_level_sigma2(), dtype=jnp.float32)


def desc_pm1_from_packed(packed):
    """(N, 8) uint32 -> (N, 256) bf16 matmul operand (for stored KF descriptors)."""
    return orb.bits_to_pm1(orb.unpack_bits(packed))
