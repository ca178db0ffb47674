"""Batched two-view triangulation + acceptance checks.

Reference: ``Initializer::Triangulate`` (DLT via SVD on the 4x4 system,
``src/Initializer.cc``) and the validity gates of ``CheckRT`` /
``LocalMapping::CreateNewMapPoints`` (``src/LocalMapping.cc:231-476``): finite,
positive depth in both views, parallax, and reprojection error thresholds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import CameraConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.solvers import linalg as linalg_ops
from fishbirdeyevisualslam_tpu.solvers.linalg import nullvec


class TriangulationResult(NamedTuple):
    Xw: jnp.ndarray       # (N, 3) world points
    valid: jnp.ndarray    # (N,) bool — all gates including parallax
    geom_ok: jnp.ndarray  # (N,) bool — depth/reproj/finite gates only (CheckRT's
                          # nGood counts these; low-parallax points are counted
                          # good but not triangulated)
    parallax: jnp.ndarray # (N,) cos(parallax angle)


def _projection_rows(cam: CameraConfig, Tcw):
    """3x4 projection matrix K [R|t] from a pose 7-vector."""
    R = se3.quat_to_matrix(Tcw[..., :4])
    t = Tcw[..., 4:]
    K = jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]],
        dtype=Tcw.dtype,
    )
    return K @ jnp.concatenate([R, t[..., :, None]], axis=-1)  # (3, 4)


def triangulate(
    cam: CameraConfig,
    Tcw1,
    Tcw2,
    uv1,
    uv2,
    max_reproj_err: float = 4.0,
    min_parallax_cos: float = 0.99998,
):
    """DLT triangulation of N correspondences (undistorted pixels) seen from two
    camera poses.  Acceptance mirrors ``CheckRT``: finite, z>0 in both frames,
    parallax cos < min_parallax_cos, squared reprojection error below
    ``max_reproj_err`` (chi2-style, default 4.0 px^2 like sigma-scaled gates).
    """
    P1 = _projection_rows(cam, Tcw1)
    P2 = _projection_rows(cam, Tcw2)

    def rows(P, uv):
        # DLT rows: u * P3 - P1 ; v * P3 - P2
        r1 = uv[..., 0:1] * P[2] - P[0]
        r2 = uv[..., 1:2] * P[2] - P[1]
        return r1, r2

    a1, a2 = rows(P1, uv1)
    a3, a4 = rows(P2, uv2)
    A = jnp.stack([a1, a2, a3, a4], axis=-2)  # (N, 4, 4)
    # row normalization: raw DLT rows mix pixel-scale (~1e3) and unit-scale
    # entries, so the nullspace solve needs balanced rows in f32 (measured:
    # unbalanced rows drop ~1/3 of good points vs CPU).  The nullvector comes
    # from batched QR+SVD (condition number not squared — solvers.linalg),
    # and the GN polish below is locally quadratic, restoring CPU-level
    # acceptance in pure f32.
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    X_h = nullvec(A)
    w_ok = jnp.abs(X_h[..., 3]) > 1e-9
    Xw = X_h[..., :3] / jnp.where(w_ok[..., None], X_h[..., 3:], 1.0)

    # Gauss-Newton polish: 2 damped iterations on the two-view reprojection
    # residual (4 residuals, 3 unknowns per point, batched 3x3 solves).  The
    # DLT gives the basin; GN is locally quadratic, so f32 suffices where the
    # global algebraic solve does not.
    R1 = se3.quat_to_matrix(Tcw1[..., :4])
    R2 = se3.quat_to_matrix(Tcw2[..., :4])

    def gn_step(X):
        H = jnp.zeros(X.shape[:-1] + (3, 3), X.dtype)
        g = jnp.zeros(X.shape[:-1] + (3,), X.dtype)
        err = jnp.zeros(X.shape[:-1], X.dtype)
        for Tcw, R, uv in ((Tcw1, R1, uv1), (Tcw2, R2, uv2)):
            p = se3.transform(Tcw, X)
            z = jnp.where(jnp.abs(p[..., 2]) < 1e-6, 1e-6, p[..., 2])
            eu = cam.fx * p[..., 0] / z + cam.cx - uv[..., 0]
            ev = cam.fy * p[..., 1] / z + cam.cy - uv[..., 1]
            # d(uv)/dp (2, 3) rows, then chain through R: J = Juv_p @ R
            ju_p = jnp.stack([cam.fx / z, jnp.zeros_like(z),
                              -cam.fx * p[..., 0] / (z * z)], axis=-1)
            jv_p = jnp.stack([jnp.zeros_like(z), cam.fy / z,
                              -cam.fy * p[..., 1] / (z * z)], axis=-1)
            ju = jnp.einsum("...i,...ij->...j", ju_p, R)
            jv = jnp.einsum("...i,...ij->...j", jv_p, R)
            H = H + ju[..., :, None] * ju[..., None, :] \
                  + jv[..., :, None] * jv[..., None, :]
            g = g + ju * eu[..., None] + jv * ev[..., None]
            err = err + eu * eu + ev * ev
        lam = 1e-6 * (H[..., 0, 0] + H[..., 1, 1] + H[..., 2, 2]) + 1e-12
        Hd = H + lam[..., None, None] * jnp.eye(3, dtype=X.dtype)
        # closed-form 3x3 solve: the LU custom call is ~20x slower for
        # thousands of batched tiny systems on TPU (solvers/linalg.py)
        dx = linalg_ops.solve3(Hd, g)
        X_new = X - dx
        ok = jnp.all(jnp.isfinite(X_new), axis=-1)
        return jnp.where(ok[..., None], X_new, X)

    Xw = gn_step(gn_step(Xw))

    p1 = se3.transform(Tcw1, Xw)
    p2 = se3.transform(Tcw2, Xw)
    z_ok = (p1[..., 2] > 0) & (p2[..., 2] > 0)

    # parallax between viewing rays (camera centers in world frame)
    C1 = se3.inverse(Tcw1)[..., 4:]
    C2 = se3.inverse(Tcw2)[..., 4:]
    r1 = Xw - C1
    r2 = Xw - C2
    cosp = jnp.sum(r1 * r2, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-12
    )
    par_ok = cosp < min_parallax_cos

    def reproj_err(p, uv):
        z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
        u = cam.fx * p[..., 0] / z + cam.cx
        v = cam.fy * p[..., 1] / z + cam.cy
        return (u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2

    e_ok = (reproj_err(p1, uv1) < max_reproj_err) & (reproj_err(p2, uv2) < max_reproj_err)
    finite = jnp.all(jnp.isfinite(Xw), axis=-1)
    geom_ok = w_ok & z_ok & e_ok & finite
    return TriangulationResult(Xw, geom_ok & par_ok, geom_ok, cosp)
