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
    # null vector of A: smallest right singular vector.  SVD of many 4x4s is
    # cheap and batched; use eigh on A^T A for speed + determinism.
    AtA = jnp.einsum("nij,nik->njk", A, A)
    w, V = jnp.linalg.eigh(AtA)
    X_h = V[..., :, 0]  # eigenvector of smallest eigenvalue
    w_ok = jnp.abs(X_h[..., 3]) > 1e-9
    Xw = X_h[..., :3] / jnp.where(w_ok[..., None], X_h[..., 3:], 1.0)

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
