"""Batched residuals + analytic Jacobians for every factor type in the system.

The factor zoo mirrors the reference's g2o edges (SURVEY.md §7):

  * front 2D reprojection       — ``EdgeSE3ProjectXYZOnlyPose[Quat]`` /
                                  ``EdgeSE3ProjectXYZ2UVQuat``
  * bird 3D point-to-point      — ``EdgeSE3ProjectBirdPoint2CamXYZ`` /
                                  ``EdgeSE3ProjectXYZ2XYZQuat``
  * SE3 relative pose (odometry)— ``EdgeSE3Quat``
  * Sim3/SE3 pose graph         — essential-graph edges

Conventions: pose = world-to-camera Tcw 7-vector; tangent xi = (omega, upsilon),
left-multiplicative (T <- exp(xi) T), so d(T X)/dxi = [-[p]x | I] with p = T X —
identical to the reference's hand-written Jacobians (``src/OdomG2oTypeQuat.cc``).
All functions are vmapped over the observation axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import CameraConfig
from fishbirdeyevisualslam_tpu.geometry import se3


def point_jacobian_blocks(p):
    """(..., 3) camera-frame points -> (..., 3, 6) blocks [-[p]x | I]."""
    return jnp.concatenate(
        [-se3.skew(p), jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), p.shape[:-1] + (3, 3))],
        axis=-1,
    )


def front_residuals(cam: CameraConfig, Tcw, Xw, uv):
    """2D reprojection residual e = uv_obs - project(Tcw Xw) and its 2x6 pose
    Jacobian (reference ``EdgeSE3ProjectXYZOnlyPoseQuat::linearizeOplus``,
    ``src/OdomG2oTypeQuat.cc:6-23``).

    Returns (e (N,2), J_pose (N,2,6), p_cam (N,3)).
    """
    p = se3.transform(Tcw, Xw)
    x, y = p[..., 0], p[..., 1]
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-6, 1e-6, p[..., 2])
    u = cam.fx * x / z + cam.cx
    v = cam.fy * y / z + cam.cy
    e = uv - jnp.stack([u, v], axis=-1)
    z2 = z * z
    zero = jnp.zeros_like(z)
    # jacobian_e_p = -[[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
    Jep = -jnp.stack(
        [
            jnp.stack([cam.fx / z, zero, -cam.fx * x / z2], axis=-1),
            jnp.stack([zero, cam.fy / z, -cam.fy * y / z2], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    J = Jep @ point_jacobian_blocks(p)  # (N, 2, 6)
    return e, J, p


def front_point_jacobian(cam: CameraConfig, Tcw, Xw):
    """2x3 Jacobian of the front residual wrt the WORLD point (for BA):
    J_pt = jacobian_e_p @ R  (reference ``EdgeSE3ProjectXYZ2UVQuat::linearizeOplus``,
    ``src/OdomG2oTypeQuat.cc:109-129``)."""
    p = se3.transform(Tcw, Xw)
    x, y = p[..., 0], p[..., 1]
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-6, 1e-6, p[..., 2])
    z2 = z * z
    zero = jnp.zeros_like(z)
    Jep = -jnp.stack(
        [
            jnp.stack([cam.fx / z, zero, -cam.fx * x / z2], axis=-1),
            jnp.stack([zero, cam.fy / z, -cam.fy * y / z2], axis=-1),
        ],
        axis=-2,
    )
    R = se3.quat_to_matrix(Tcw[..., :4])
    return Jep @ R


def bird_residuals(Tcw, Xw, Xc):
    """Bird 3D-3D residual e = Xc - Tcw Xw, pose Jacobian -[-[p]x | I]
    (reference ``EdgeSE3ProjectBirdPoint2CamXYZ``, ``OdomG2oTypeQuat.h:89-109``,
    ``.cc:61-78``).  Returns (e (N,3), J_pose (N,3,6), p_cam (N,3))."""
    p = se3.transform(Tcw, Xw)
    e = Xc - p
    J = -point_jacobian_blocks(p)
    return e, J, p


def bird_point_jacobian(Tcw, Xw):
    """3x3 Jacobian wrt the world point: -R (reference
    ``EdgeSE3ProjectXYZ2XYZQuat::linearizeOplus``, ``.cc:157-169``)."""
    R = se3.quat_to_matrix(Tcw[..., :4])
    shape = jnp.broadcast_shapes(Xw.shape[:-1], Tcw.shape[:-1]) + (3, 3)
    return jnp.broadcast_to(-R, shape)


def odom_residuals(T_meas, T1, T2):
    """SE3 relative-pose residual e = log(m^-1 T1 T2^-1) with the reference's
    Jacobians (``EdgeSE3Quat::linearizeOplus``, ``src/OdomG2oTypeQuat.cc:191-204``):
      J1 = JRInv(e) * Adj(T2) * Adj(T1^-1),   J2 = -JRInv(e).
    Returns (e (N,6), J1 (N,6,6), J2 (N,6,6)).
    """
    e = se3.relative_error(T_meas, T1, T2)
    Jr = se3.jr_inv_approx(e)
    J1 = Jr @ se3.adjoint(T2) @ se3.adjoint(se3.inverse(T1))
    J2 = -Jr
    return e, J1, J2


def front_error(cam: CameraConfig, Tcw, Xw, uv):
    """Residual-only front reprojection (no Jacobians) for chi2 evaluation.
    Returns (e (N,2), p_cam (N,3))."""
    p = se3.transform(Tcw, Xw)
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-6, 1e-6, p[..., 2])
    u = cam.fx * p[..., 0] / z + cam.cx
    v = cam.fy * p[..., 1] / z + cam.cy
    return uv - jnp.stack([u, v], axis=-1), p


def bird_error(Tcw, Xw, Xc):
    """Residual-only bird 3D-3D (no Jacobians). Returns (e (N,3), p_cam)."""
    p = se3.transform(Tcw, Xw)
    return Xc - p, p


def huber_weights(chi2, delta: float):
    """IRLS weight rho'(s): 1 inside the Huber region, delta/sqrt(s) outside
    (g2o RobustKernelHuber semantics; delta = sqrt(5.991) in the reference)."""
    d2 = delta * delta
    return jnp.where(chi2 <= d2, 1.0, delta / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
