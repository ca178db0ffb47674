"""Inverse-perspective-mapped (IPM) bird's-eye view geometry.

Maps between bird-view pixels, metric vehicle-base ground-plane coordinates (z=0),
and front-camera 3D, replicating the reference's fixed pixel<->meter mappings
(``src/Converter.cc:284-318``) and the static camera<->base extrinsics
(``src/Frame.cc:1015-1047``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import BirdConfig, ExtrinsicsConfig
from fishbirdeyevisualslam_tpu.geometry import se3


def bird_pixel_to_base_xy(cfg: BirdConfig, pix):
    """Bird pixel (u=col, v=row) -> base-frame ground point (x fwd, y left, z=0).

    Reference ``Converter::BirdPixel2BaseXY`` (``src/Converter.cc:294-302``):
      x = (rows/2 - v) * pixel2meter + rear_axle_to_center
      y = (cols/2 - u) * pixel2meter
    """
    u, v = pix[..., 0], pix[..., 1]
    x = (cfg.rows / 2.0 - v) * cfg.pixel2meter + cfg.rear_axle_to_center
    y = (cfg.cols / 2.0 - u) * cfg.pixel2meter
    return jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)


def base_xy_to_bird_pixel(cfg: BirdConfig, p):
    """Inverse mapping (``Converter::BaseXY2BirdPixel``, ``src/Converter.cc:304-310``)."""
    u = cfg.cols / 2.0 - p[..., 1] * cfg.meter2pixel
    v = cfg.rows / 2.0 - (p[..., 0] - cfg.rear_axle_to_center) * cfg.meter2pixel
    return jnp.stack([u, v], axis=-1)


def extrinsics_Tbc(ext: ExtrinsicsConfig, dtype=jnp.float32):
    """Pose of camera in base frame as a 7-vector (reference ``Frame.cc:1015-1047``)."""
    qx, qy, qz, qw = ext.q_bc_xyzw
    q = np.array([qw, qx, qy, qz], dtype=np.float64)
    q = q / np.linalg.norm(q)
    return jnp.concatenate(
        [jnp.asarray(q, dtype=dtype), jnp.asarray(ext.t_bc, dtype=dtype)]
    )


def extrinsics_Tcb(ext: ExtrinsicsConfig, dtype=jnp.float32):
    return se3.inverse(extrinsics_Tbc(ext, dtype))


def base_xyz_to_cam(ext: ExtrinsicsConfig, p):
    """Base-frame 3D -> front-camera 3D (``Converter::BaseXY2CamXYZ``,
    ``src/Converter.cc:312-318``)."""
    return se3.transform(extrinsics_Tcb(ext, p.dtype), p)


def cam_xyz_to_base(ext: ExtrinsicsConfig, p):
    return se3.transform(extrinsics_Tbc(ext, p.dtype), p)


def bird_pixel_to_cam_xyz(bird: BirdConfig, ext: ExtrinsicsConfig, pix):
    """Full bird keypoint back-projection used in the dual-view Frame ctor
    (``src/Frame.cc:363-373``): pixel -> base ground point -> camera frame."""
    return base_xyz_to_cam(ext, bird_pixel_to_base_xy(bird, pix))


def Twb_from_Twc(ext: ExtrinsicsConfig, Twc):
    """Camera world pose -> base world pose: Twb = Twc composed with extrinsics.
    Reference exports Tbw = Tbc * Tcw * Two-ish forms (``System.cc:543-585``);
    here Twb = Twc * Tcb."""
    return se3.compose(Twc, extrinsics_Tcb(ext, Twc.dtype))


def Tcw_from_Twb(ext: ExtrinsicsConfig, Twb):
    """Base world pose -> camera world-to-camera: Tcw = (Twb * Tbc)^-1
    (``Converter::Twb2Tcw``, ``src/Converter.cc:196-202``)."""
    return se3.inverse(se3.compose(Twb, extrinsics_Tbc(ext, Twb.dtype)))
