"""Batched RANSAC PnP for relocalization.

The reference relocalizes with EPnP + RANSAC (``src/PnPsolver.cc``,
``Tracking.cc:2231-2392``).  Here the minimal solver is a 6-point DLT estimate
of the projection matrix (batched eigh of the 12x12 normal matrix) with
orthonormalization of the rotation — a closed form that vmaps cleanly; RANSAC
hypotheses are all evaluated in parallel and the winner is refined by the
standard LM pose optimizer (which the reference also does via
``PoseOptimization`` after ``PnPsolver::iterate``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import CameraConfig
from fishbirdeyevisualslam_tpu.geometry import se3


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    success: jnp.ndarray


def _dlt_pose(cam: CameraConfig, Xw, uv):
    """Projection-matrix DLT from >= 6 correspondences; returns Tcw (7,)."""
    # normalize pixels to camera plane
    x = (uv[:, 0] - cam.cx) / cam.fx
    y = (uv[:, 1] - cam.cy) / cam.fy
    n = Xw.shape[0]
    zeros = jnp.zeros((n, 4))
    Xh = jnp.concatenate([Xw, jnp.ones((n, 1))], axis=-1)
    rows_u = jnp.concatenate([Xh, zeros, -x[:, None] * Xh], axis=-1)
    rows_v = jnp.concatenate([zeros, Xh, -y[:, None] * Xh], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2n, 12)
    _, V = jnp.linalg.eigh(A.T @ A)
    P = V[:, 0].reshape(3, 4)
    M = P[:, :3]
    # sign: points must land in front (positive depth for the mean point)
    mean_depth = (M[2] @ Xw.mean(0) + P[2, 3])
    P = P * jnp.sign(mean_depth)
    M = P[:, :3]
    # scale by 1/||row3|| so R is approximately orthonormal
    scale = jnp.linalg.norm(M[2])
    P = P / jnp.maximum(scale, 1e-12)
    M = P[:, :3]
    U, _, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    t = P[:, 3]
    return se3.make(se3.matrix_to_quat(R), t)


def _reproj_err(cam, Tcw, Xw, uv):
    p = se3.transform(Tcw, Xw)
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-6, 1e-6, p[..., 2])
    u = cam.fx * p[..., 0] / z + cam.cx
    v = cam.fy * p[..., 1] / z + cam.cy
    good_z = p[..., 2] > 0
    return jnp.where(good_z, (u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2, 1e12)


def ransac_pnp(
    cam: CameraConfig, Xw, uv, valid, key,
    n_iters: int = 128,
    chi2_thresh: float = 5.991,
    min_inliers: int = 10,
) -> PnPResult:
    """RANSAC parameters mirror the reference's
    ``SetRansacParameters(0.99, 10, 300, 4(min set), 0.5, 5.991)``
    (``Tracking.cc:2276``); minimal set here is 6 (DLT)."""
    n = Xw.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_iters, n)) + logits[None, :]
    _, samples = jax.lax.top_k(g, 6)

    def one(idx):
        T = _dlt_pose(cam, Xw[idx], uv[idx])
        e2 = _reproj_err(cam, T, Xw, uv)
        inl = valid & (e2 < chi2_thresh * 4.0)  # generous gate pre-refinement
        return T, jnp.sum(inl.astype(jnp.int32))

    Ts, counts = jax.vmap(one)(samples)
    best = jnp.argmax(counts)
    T = Ts[best]
    e2 = _reproj_err(cam, T, Xw, uv)
    inl = valid & (e2 < chi2_thresh * 4.0)
    n_in = jnp.sum(inl.astype(jnp.int32))
    return PnPResult(T, inl, n_in, n_in >= min_inliers)
