"""Wheel-odometry SE(2) pre-integration.

The reference receives per-frame planar odometry (x, y, theta) and converts pairs to
relative SE(3) transforms in the base frame (``src/Frame.cc:1049-1067``,
``src/Converter.cc:241-282``), which serve as (a) tracking motion priors, (b) the
metric scale at initialization, and (c) inter-keyframe pose-graph factors in BA.
"""

from __future__ import annotations

import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import ExtrinsicsConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.geometry.ipm import extrinsics_Tbc, extrinsics_Tcb


def se2_to_se3(pose2d):
    """(x, y, theta) -> base-frame SE3 7-vector (rotation about z).
    Matches ``Frame::GetGTPoseTwb`` (``src/Frame.cc:1069-1079``)."""
    x, y, theta = pose2d[..., 0], pose2d[..., 1], pose2d[..., 2]
    half = 0.5 * theta
    q = jnp.stack([jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)], axis=-1)
    t = jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)
    return se3.make(q, t)


def preintegrate_base(odom1, odom2):
    """Relative base motion T_b1_b2 from two planar odometry readings.

    Pre-integration terms (``src/Frame.cc:1055-1058``):
      theta12 = theta2 - theta1
      x12 = (x2-x1) cos t1 + (y2-y1) sin t1
      y12 = (y2-y1) cos t1 - (x2-x1) sin t1
    """
    x1, y1, t1 = odom1[..., 0], odom1[..., 1], odom1[..., 2]
    x2, y2, t2 = odom2[..., 0], odom2[..., 1], odom2[..., 2]
    theta12 = t2 - t1
    dx, dy = x2 - x1, y2 - y1
    x12 = dx * jnp.cos(t1) + dy * jnp.sin(t1)
    y12 = dy * jnp.cos(t1) - dx * jnp.sin(t1)
    return se2_to_se3(jnp.stack([x12, y12, theta12], axis=-1))


def preintegrate_cam(ext: ExtrinsicsConfig, odom1, odom2):
    """Relative camera motion: T12c = Tcb * T12b * Tbc (``src/Frame.cc:1065``).

    Note the reference's ``Frame::GetTransformFromOdometer`` returns T12c and
    tracking then uses its *inverse* as ``detlaT`` to map last-frame pose forward
    (``Tracking.cc:1316``); ``Converter::GetTci1ci2FromOdometer`` already returns the
    inverse (``src/Converter.cc:261-282``).  Here we return T_c1_c2 directly.
    """
    T12b = preintegrate_base(odom1, odom2)
    return se3.compose(se3.compose(extrinsics_Tcb(ext, T12b.dtype), T12b),
                       extrinsics_Tbc(ext, T12b.dtype))


def motion_prior_Tcw(ext: ExtrinsicsConfig, Tcw_prev, odom_prev, odom_cur):
    """Odometry-seeded pose prior for the current frame:
    Tcw_cur = T_c2_c1 * Tcw_prev  (reference seeds with detlaT * ref pose,
    ``Tracking.cc:1316-1320``)."""
    T_c1_c2 = preintegrate_cam(ext, odom_prev, odom_cur)
    return se3.compose(se3.inverse(T_c1_c2), Tcw_prev)
