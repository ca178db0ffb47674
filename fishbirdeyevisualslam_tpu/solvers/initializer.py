"""Two-view monocular initialization with odometry metric scale.

Re-implements ``Initializer`` (``src/Initializer.cc``) as batched fixed-iteration
RANSAC + closed-form reconstruction:

  * normalized 8-point fundamental-matrix estimation over a fixed batch of RANSAC
    samples (the reference runs 200 iterations in a worker thread, ``:112-122``;
    here all hypotheses are one batched eigh),
  * symmetric epipolar chi2 scoring (``CheckFundamental``, th=3.841, score base
    5.991),
  * E = K^T F K decomposition into 4 (R, t) hypotheses (``DecomposeE``),
  * METRIC SCALE from wheel odometry: t <- t * (t_odom . t_unit) when loose
    coupling is on (``ReconstructF``, ``:567-585``) — the monocular scale
    ambiguity is resolved at birth,
  * hypothesis selection by triangulation census (``CheckRT``: 0.9N inliers, no
    runner-up within 70%, parallax gate),
  * re-initialization after loss: rotation taken from odometry, only +/-t tested
    (``ReInitconstructF``, ``:672-775``).

The reference's homography branch (RH > 0.4 model selection) is intentionally
not replicated yet: on its driving sequences the front view is deep-scene and F
wins; H support can be added as a second scorer later.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import CameraConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.solvers.triangulate import triangulate


class InitResult(NamedTuple):
    success: jnp.ndarray      # () bool
    T21: jnp.ndarray          # (7,) camera-2-from-camera-1 pose (Tcw of frame2 if frame1 = I)
    Xw: jnp.ndarray           # (N, 3) triangulated points in frame-1 camera coords
    triangulated: jnp.ndarray # (N,) bool
    n_good: jnp.ndarray       # () int32


def _normalize(uv, valid):
    w = valid.astype(uv.dtype)
    n = jnp.maximum(w.sum(), 1.0)
    mean = jnp.sum(uv * w[:, None], axis=0) / n
    d = jnp.abs(uv - mean) * w[:, None]
    meandev = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(meandev, 1e-8)
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]],
        dtype=uv.dtype,
    )
    return (uv - mean) * s, T


def _eight_point(uv1n, uv2n):
    """F from >=8 normalized correspondences: nullvec of A^T A, then rank-2."""
    u1, v1 = uv1n[:, 0], uv1n[:, 1]
    u2, v2 = uv2n[:, 0], uv2n[:, 1]
    one = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1)
    _, V = jnp.linalg.eigh(A.T @ A)
    F = V[:, 0].reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(F)
    F = (U * s.at[2].set(0.0)[None, :]) @ Vt
    return F


def _score_F(F, uv1, uv2, valid, sigma: float = 1.0):
    """Symmetric transfer chi2 score (reference ``CheckFundamental``)."""
    th, th_score = 3.841, 5.991
    inv_s2 = 1.0 / (sigma * sigma)
    ones = jnp.ones_like(uv1[:, :1])
    p1 = jnp.concatenate([uv1, ones], axis=-1)
    p2 = jnp.concatenate([uv2, ones], axis=-1)
    Fp1 = p1 @ F.T    # epipolar line in image 2
    Ftp2 = p2 @ F     # epipolar line in image 1
    num = jnp.sum(p2 * Fp1, axis=-1)
    d2_2 = num * num / jnp.maximum(Fp1[:, 0] ** 2 + Fp1[:, 1] ** 2, 1e-12) * inv_s2
    d2_1 = num * num / jnp.maximum(Ftp2[:, 0] ** 2 + Ftp2[:, 1] ** 2, 1e-12) * inv_s2
    in1 = (d2_1 < th) & valid
    in2 = (d2_2 < th) & valid
    score = jnp.sum(jnp.where(in1, th_score - d2_1, 0.0)) + jnp.sum(
        jnp.where(in2, th_score - d2_2, 0.0)
    )
    return score, in1 & in2


def ransac_fundamental(uv1, uv2, valid, key, n_iters: int = 200, sigma: float = 1.0):
    """Fixed-batch RANSAC: all hypotheses estimated and scored in parallel."""
    n = uv1.shape[0]
    # sample from valid indices (Gumbel top-k per iteration = distinct samples)
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_iters, n)) + logits[None, :]
    _, sample_idx = jax.lax.top_k(g, 8)  # (iters, 8) distinct valid indices

    uv1n_all, T1 = _normalize(uv1, valid)
    uv2n_all, T2 = _normalize(uv2, valid)

    def one(idx):
        Fn = _eight_point(uv1n_all[idx], uv2n_all[idx])
        F = T2.T @ Fn @ T1
        F = F / jnp.where(jnp.abs(F[2, 2]) < 1e-12, 1.0, F[2, 2])
        s, _ = _score_F(F, uv1, uv2, valid, sigma)
        return F, s

    Fs, scores = jax.vmap(one)(sample_idx)
    best = jnp.argmax(scores)
    F = Fs[best]
    score, inliers = _score_F(F, uv1, uv2, valid, sigma)
    return F, score, inliers


def decompose_E(E):
    """4 motion hypotheses from an essential matrix (reference ``DecomposeE``)."""
    U, _, Vt = jnp.linalg.svd(E)
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    return R1, R2, t


def _census(cam, R, t, uv1, uv2, valid, sigma2: float):
    """CheckRT analog: triangulate under (R, t) and count acceptable points.
    Returns (n_good, mask, cos-parallax median over good)."""
    Tcw1 = se3.identity()
    Tcw2 = se3.make(se3.matrix_to_quat(R), t)
    tri = triangulate(
        cam, Tcw1, Tcw2, uv1, uv2,
        max_reproj_err=4.0 * sigma2, min_parallax_cos=0.99998,
    )
    # census counts low-parallax points too (CheckRT's nGood); only the
    # triangulated mask requires parallax
    n_good = jnp.sum((tri.geom_ok & valid).astype(jnp.int32))
    return n_good, tri.valid & valid, tri


def initialize(
    cam: CameraConfig,
    uv1,
    uv2,
    valid,
    T21_odom,
    key,
    loose_couple: bool = True,
    n_iters: int = 200,
    sigma: float = 1.0,
    min_triangulated: int = 50,
) -> InitResult:
    """Full two-view init.  ``T21_odom``: camera-frame relative pose T_c2_c1 from
    odometry pre-integration (provides the metric scale and the ReInit rotation).
    ``uv*`` are undistorted pixels; frame 1 is gauge (identity).
    """
    K = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]], jnp.float32)
    F, score, inliers = ransac_fundamental(uv1, uv2, valid, key, n_iters, sigma)
    E = K.T @ F @ K
    R1, R2, t = decompose_E(E)

    t_odom = T21_odom[4:]
    scale = jnp.where(loose_couple, jnp.dot(t_odom, t), 1.0)
    t = t * scale  # metric scale from odometry (Initializer.cc:567-585)

    sigma2 = sigma * sigma
    hyps = [(R1, t), (R2, t), (R1, -t), (R2, -t)]
    counts, masks, tris = [], [], []
    for R_h, t_h in hyps:
        n, m, tri = _census(cam, R_h, t_h, uv1, uv2, inliers, sigma2)
        counts.append(n)
        masks.append(m)
        tris.append(tri)
    counts_a = jnp.stack(counts)
    max_good = jnp.max(counts_a)
    n_similar = jnp.sum((counts_a > 0.7 * max_good).astype(jnp.int32))
    N = jnp.sum(inliers.astype(jnp.int32))
    n_min = jnp.maximum((0.9 * N).astype(jnp.int32), min_triangulated)
    ok = (max_good >= n_min) & (n_similar == 1)

    best = jnp.argmax(counts_a)
    T21s = jnp.stack([se3.make(se3.matrix_to_quat(R_h), t_h) for R_h, t_h in hyps])
    Xws = jnp.stack([tr.Xw for tr in tris])
    ms = jnp.stack(masks)
    return InitResult(ok, T21s[best], Xws[best], ms[best] & ok, max_good)


def reinitialize(
    cam: CameraConfig,
    uv1,
    uv2,
    valid,
    T21_odom,
    key,
    n_iters: int = 200,
    sigma: float = 1.0,
    min_triangulated: int = 50,
) -> InitResult:
    """Loss recovery (``ReInitialize``/``ReInitconstructF``): F only gates the
    inlier set; rotation comes from odometry, only the +/- scaled t direction from
    E is tested."""
    K = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]], jnp.float32)
    F, score, inliers = ransac_fundamental(uv1, uv2, valid, key, n_iters, sigma)
    E = K.T @ F @ K
    _, _, t = decompose_E(E)
    R3 = se3.quat_to_matrix(T21_odom[:4])
    t_odom = T21_odom[4:]
    t = t * jnp.dot(t_odom, t)

    sigma2 = sigma * sigma
    n5, m5, tri5 = _census(cam, R3, t, uv1, uv2, inliers, sigma2)
    n6, m6, tri6 = _census(cam, R3, -t, uv1, uv2, inliers, sigma2)
    counts = jnp.stack([n5, n6])
    max_good = jnp.max(counts)
    n_similar = jnp.sum((counts > 0.7 * max_good).astype(jnp.int32))
    N = jnp.sum(inliers.astype(jnp.int32))
    n_min = jnp.maximum((0.9 * N).astype(jnp.int32), min_triangulated)
    ok = (max_good >= n_min) & (n_similar == 1)
    best = jnp.argmax(counts)
    T21s = jnp.stack([se3.make(se3.matrix_to_quat(R3), t), se3.make(se3.matrix_to_quat(R3), -t)])
    Xws = jnp.stack([tri5.Xw, tri6.Xw])
    ms = jnp.stack([m5, m6])
    return InitResult(ok, T21s[best], Xws[best], ms[best] & ok, max_good)
