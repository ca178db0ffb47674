"""Front fisheye camera model: equidistant (Kannala-Brandt k1..k4) distortion,
pinhole projection on undistorted coordinates.

The reference undistorts detected keypoints once per frame with
``cv::fisheye::undistortPoints`` (``src/Frame.cc:638-669``) and afterwards treats the
camera as a plain pinhole (all reprojection residuals use fx,fy,cx,cy on the
undistorted keypoints, e.g. ``src/OdomG2oTypeQuat.cc:24-30``).  We mirror that:
a batched Newton-iteration undistort kernel feeding pinhole residuals.

All functions are shape-polymorphic over leading batch dims and jit-safe
(fixed iteration counts, no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import CameraConfig


def project_pinhole(cam: CameraConfig, xyz):
    """Camera-frame 3D -> undistorted pixel (u, v).  No distortion (post-undistort
    convention).  z<=0 handling is the caller's responsibility via masks."""
    z = xyz[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * xyz[..., 0] / zs + cam.cx
    v = cam.fy * xyz[..., 1] / zs + cam.cy
    return jnp.stack([u, v], axis=-1)


def backproject_pinhole(cam: CameraConfig, uv, z):
    """Undistorted pixel + depth -> camera-frame 3D (reference ``Frame.cc:1000-1008``)."""
    x = (uv[..., 0] - cam.cx) * z / cam.fx
    y = (uv[..., 1] - cam.cy) * z / cam.fy
    return jnp.stack([x, y, z], axis=-1)


def _theta_d(cam: CameraConfig, theta):
    t2 = theta * theta
    return theta * (1.0 + t2 * (cam.k1 + t2 * (cam.k2 + t2 * (cam.k3 + t2 * cam.k4))))


def _theta_d_prime(cam: CameraConfig, theta):
    t2 = theta * theta
    return 1.0 + t2 * (3 * cam.k1 + t2 * (5 * cam.k2 + t2 * (7 * cam.k3 + t2 * 9 * cam.k4)))


def distort_fisheye(cam: CameraConfig, uv_undist):
    """Ideal (undistorted) pixel -> distorted pixel, equidistant model.

    x = (u-cx)/fx etc.; r = |x,y|; theta = atan(r); r_d = theta_d(theta);
    distorted = x * r_d / r.
    """
    x = (uv_undist[..., 0] - cam.cx) / cam.fx
    y = (uv_undist[..., 1] - cam.cy) / cam.fy
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan(r)
    rd = _theta_d(cam, theta)
    scale = jnp.where(r < 1e-9, 1.0, rd / jnp.where(r < 1e-9, 1.0, r))
    u = cam.fx * x * scale + cam.cx
    v = cam.fy * y * scale + cam.cy
    return jnp.stack([u, v], axis=-1)


def undistort_fisheye(cam: CameraConfig, uv_dist, iters: int = 10):
    """Distorted pixel -> undistorted pixel via Newton on theta (the inverse of the
    equidistant polynomial), matching cv::fisheye::undistortPoints semantics
    (used at ``src/Frame.cc:657``).  Fixed ``iters`` Newton steps (jit-safe)."""
    xd = (uv_dist[..., 0] - cam.cx) / cam.fx
    yd = (uv_dist[..., 1] - cam.cy) / cam.fy
    theta_d = jnp.sqrt(xd * xd + yd * yd)
    theta = theta_d  # init
    for _ in range(iters):
        f = _theta_d(cam, theta) - theta_d
        fp = _theta_d_prime(cam, theta)
        theta = theta - f / jnp.where(jnp.abs(fp) < 1e-9, 1e-9, fp)
    # Rays at ~90 deg off-axis have no pinhole image (tan singularity); clamp just
    # below pi/2 so out-of-FOV pixels stay finite instead of diverging (this camera's
    # corners reach theta ~ 1.55).
    theta = jnp.clip(theta, -1.565, 1.565)
    r = jnp.tan(theta)
    scale = jnp.where(theta_d < 1e-9, 1.0, r / jnp.where(theta_d < 1e-9, 1.0, theta_d))
    u = cam.fx * xd * scale + cam.cx
    v = cam.fy * yd * scale + cam.cy
    return jnp.stack([u, v], axis=-1)
