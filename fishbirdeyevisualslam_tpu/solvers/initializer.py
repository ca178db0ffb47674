"""Two-view monocular initialization with odometry metric scale.

Re-implements ``Initializer`` (``src/Initializer.cc``) as batched fixed-iteration
RANSAC + closed-form reconstruction:

  * normalized 8-point fundamental-matrix estimation over a fixed batch of RANSAC
    samples (the reference runs 200 iterations in a worker thread, ``:112-122``;
    here all hypotheses are one batched QR+SVD nullspace solve),
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

Model selection replicates the reference: H (4-point DLT RANSAC, Faugeras
8-hypothesis decomposition, ``FindHomography``/``ReconstructH``,
``Initializer.cc:210-375,418-565``) and F are scored in one batch and the
homography wins when RH = SH/(SH+SF) > 0.40 (``Initialize``, ``:124-134``).
Unlike the reference (whose H path forgets the odometry scale — the fork only
patched ``ReconstructF``), the H branch here applies the same metric scaling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import CameraConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.solvers.linalg import nullvec
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
    """F from >=8 normalized correspondences: nullvec of A (QR+SVD — see
    ``solvers.linalg``), then rank-2 projection."""
    u1, v1 = uv1n[:, 0], uv1n[:, 1]
    u2, v2 = uv2n[:, 0], uv2n[:, 1]
    one = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1)
    F = nullvec(A).reshape(3, 3)
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

    # all-inlier refit (masked rows are zeroed), keep if better — tightens the
    # best minimal-sample hypothesis everywhere
    def refit(F, score, inliers):
        w = inliers.astype(uv1.dtype)
        u1, v1 = uv1n_all[:, 0], uv1n_all[:, 1]
        u2, v2 = uv2n_all[:, 0], uv2n_all[:, 1]
        one = jnp.ones_like(u1)
        A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2,
                       u1, v1, one], axis=-1) * w[:, None]
        Fn = nullvec(A).reshape(3, 3)
        U, s, Vt = jnp.linalg.svd(Fn)
        Fn = (U * s.at[2].set(0.0)[None, :]) @ Vt
        Fr = T2.T @ Fn @ T1
        Fr = Fr / jnp.where(jnp.abs(Fr[2, 2]) < 1e-12, 1.0, Fr[2, 2])
        score_r, inl_r = _score_F(Fr, uv1, uv2, valid, sigma)
        better = score_r > score
        return (jnp.where(better, Fr, F), jnp.where(better, score_r, score),
                jnp.where(better, inl_r, inliers))

    F, score, inliers = refit(*refit(F, score, inliers))
    return F, score, inliers


def _dlt_homography(uv1n, uv2n):
    """H from >=4 normalized correspondences (nullvec of A^T A; the reference's
    ``ComputeH21`` uses the same DLT system, ``Initializer.cc:377-416``)."""
    u1, v1 = uv1n[:, 0], uv1n[:, 1]
    u2, v2 = uv2n[:, 0], uv2n[:, 1]
    zero = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)
    r1 = jnp.stack([zero, zero, zero, -u1, -v1, -one, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, one, zero, zero, zero, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)
    return nullvec(A).reshape(3, 3)


def _score_H(H, uv1, uv2, valid, sigma: float = 1.0):
    """Symmetric transfer error score (``CheckHomography``, th = score base =
    5.991)."""
    th = 5.991
    inv_s2 = 1.0 / (sigma * sigma)
    Hinv = jnp.linalg.inv(H)
    ones = jnp.ones_like(uv1[:, :1])
    p1 = jnp.concatenate([uv1, ones], axis=-1)
    p2 = jnp.concatenate([uv2, ones], axis=-1)
    q2 = p1 @ H.T
    q2 = q2[:, :2] / jnp.where(jnp.abs(q2[:, 2:]) < 1e-12, 1e-12, q2[:, 2:])
    q1 = p2 @ Hinv.T
    q1 = q1[:, :2] / jnp.where(jnp.abs(q1[:, 2:]) < 1e-12, 1e-12, q1[:, 2:])
    d2_2 = jnp.sum((uv2 - q2) ** 2, axis=-1) * inv_s2
    d2_1 = jnp.sum((uv1 - q1) ** 2, axis=-1) * inv_s2
    in1 = (d2_1 < th) & valid
    in2 = (d2_2 < th) & valid
    score = jnp.sum(jnp.where(in1, th - d2_1, 0.0)) + jnp.sum(
        jnp.where(in2, th - d2_2, 0.0)
    )
    return score, in1 & in2


def ransac_homography(uv1, uv2, valid, key, n_iters: int = 200, sigma: float = 1.0):
    """Fixed-batch RANSAC over 8-point samples (the reference draws 8-point sets
    shared between the H and F estimators, ``Initializer.cc:79-110``)."""
    n = uv1.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_iters, n)) + logits[None, :]
    _, sample_idx = jax.lax.top_k(g, 8)

    uv1n_all, T1 = _normalize(uv1, valid)
    uv2n_all, T2 = _normalize(uv2, valid)
    T2inv = jnp.linalg.inv(T2)

    def one(idx):
        Hn = _dlt_homography(uv1n_all[idx], uv2n_all[idx])
        H = T2inv @ Hn @ T1
        H = H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1.0, H[2, 2])
        s, _ = _score_H(H, uv1, uv2, valid, sigma)
        return H, s

    Hs, scores = jax.vmap(one)(sample_idx)
    best = jnp.argmax(scores)
    H = Hs[best]
    score, inliers = _score_H(H, uv1, uv2, valid, sigma)
    return H, score, inliers


def decompose_H(H, K):
    """Faugeras–Lustman decomposition of a calibrated homography into 8 motion
    hypotheses (``ReconstructH``, ``Initializer.cc:418-565``).

    Returns (Rs (8, 3, 3), ts (8, 3) unit, degenerate: bool) — degenerate when
    the singular values are too close (pure rotation / plane at infinity)."""
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H @ K
    U, d, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]
    degenerate = (d1 / d2 < 1.00001) | (d2 / d3 < 1.00001)

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # case d' = d2
    aux_st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / (
        (d1 + d3) * d2)
    ctheta = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
    sths = jnp.array([1.0, -1.0, -1.0, 1.0]) * aux_st
    for i in range(4):
        Rp = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        Rp = Rp.at[0, 0].set(ctheta).at[2, 2].set(ctheta)
        Rp = Rp.at[0, 2].set(-sths[i]).at[2, 0].set(sths[i])
        tp = jnp.stack([x1s[i], 0.0 * x1s[i], -x3s[i]]) * (d1 - d3)
        Rs.append(s * (U @ Rp @ Vt))
        ts.append(U @ tp)
    # case d' = -d2
    aux_sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / (
        jnp.where(jnp.abs(d1 - d3) < 1e-12, 1e-12, (d1 - d3)) * d2)
    cphi = (d1 * d3 - d2 * d2) / (jnp.where(jnp.abs(d1 - d3) < 1e-12, 1e-12, (d1 - d3)) * d2)
    sphs = jnp.array([1.0, -1.0, -1.0, 1.0]) * aux_sp
    for i in range(4):
        Rp = jnp.zeros((3, 3))
        Rp = Rp.at[0, 0].set(cphi).at[2, 2].set(-cphi).at[1, 1].set(-1.0)
        Rp = Rp.at[0, 2].set(sphs[i]).at[2, 0].set(sphs[i])
        tp = jnp.stack([x1s[i], 0.0 * x1s[i], x3s[i]]) * (d1 + d3)
        Rs.append(s * (U @ Rp @ Vt))
        ts.append(U @ tp)
    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts, degenerate


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
    """Full two-view init with H/F model selection.  ``T21_odom``: camera-frame
    relative pose T_c2_c1 from odometry pre-integration (provides the metric
    scale and the ReInit rotation).  ``uv*`` are undistorted pixels; frame 1 is
    gauge (identity).
    """
    K = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]], jnp.float32)
    kF, kH = jax.random.split(key)
    F, score_f, inliers_f = ransac_fundamental(uv1, uv2, valid, kF, n_iters, sigma)
    H, score_h, inliers_h = ransac_homography(uv1, uv2, valid, kH, n_iters, sigma)
    sigma2 = sigma * sigma
    t_odom = T21_odom[4:]

    # ---- F branch: 4 hypotheses from E (ReconstructF)
    E = K.T @ F @ K
    R1, R2, t = decompose_E(E)
    scale = jnp.where(loose_couple, jnp.dot(t_odom, t), 1.0)
    t = t * scale  # metric scale from odometry (Initializer.cc:567-585)
    hyps = [(R1, t), (R2, t), (R1, -t), (R2, -t)]
    counts, masks, tris = [], [], []
    for R_h, t_h in hyps:
        n, mk, tri = _census(cam, R_h, t_h, uv1, uv2, inliers_f, sigma2)
        counts.append(n)
        masks.append(mk)
        tris.append(tri)
    counts_f = jnp.stack(counts)
    max_f = jnp.max(counts_f)
    n_similar = jnp.sum((counts_f > 0.7 * max_f).astype(jnp.int32))
    N_f = jnp.sum(inliers_f.astype(jnp.int32))
    n_min_f = jnp.maximum((0.9 * N_f).astype(jnp.int32), min_triangulated)
    ok_f = (max_f >= n_min_f) & (n_similar == 1)
    best_f = jnp.argmax(counts_f)
    T21s_f = jnp.stack([se3.make(se3.matrix_to_quat(R_h), t_h) for R_h, t_h in hyps])
    Xws_f = jnp.stack([tr.Xw for tr in tris])
    ms_f = jnp.stack(masks)

    # ---- H branch: Faugeras 8 hypotheses (ReconstructH); metric scale applied
    # per hypothesis direction (EXTENSION: the reference's H path stays
    # scale-ambiguous — its fork only patched ReconstructF)
    Rs_h, ts_h, degen_h = decompose_H(H, K)
    s_h = jnp.einsum("j,ij->i", t_odom, ts_h)
    if loose_couple:
        # metric scale via the odometry dot product.  Scaling by the signed dot
        # collapses each +/-t pair onto ONE pose (the sign ambiguity is resolved
        # by odometry), so the mirrored hypothesis (negative dot) must be
        # dropped or it would duplicate the winner and defeat the 0.75
        # uniqueness test.
        ts_h = ts_h * s_h[:, None]
        hyp_ok_h = s_h > 1e-6
    else:
        hyp_ok_h = jnp.ones((8,), bool)

    def census_h(R_h, t_h):
        return _census(cam, R_h, t_h, uv1, uv2, inliers_h, sigma2)

    counts_h, masks_h, tris_h = jax.vmap(census_h)(Rs_h, ts_h)
    counts_h = jnp.where(hyp_ok_h, counts_h, -1)
    # uniqueness on PARALLAX-QUALIFIED counts: with the odometry-scaled
    # hypotheses a near-pure-rotation solution can pass the plain cheirality
    # census almost as well as the true motion; requiring parallax (which the
    # reference's best-hypothesis check also gates on) separates them
    n_par_h = jnp.where(hyp_ok_h, jnp.sum(masks_h.astype(jnp.int32), axis=1), -1)
    top2, _ = jax.lax.top_k(n_par_h, 2)
    N_h = jnp.sum(inliers_h.astype(jnp.int32))
    n_min_h = jnp.maximum((0.9 * N_h).astype(jnp.int32), min_triangulated)
    best_h = jnp.argmax(n_par_h)
    ok_h = (counts_h[best_h] >= n_min_h) & (top2[1] < 0.75 * jnp.maximum(top2[0], 1)) \
        & (~degen_h)
    T21s_h = jax.vmap(lambda R_, t_: se3.make(se3.matrix_to_quat(R_), t_))(Rs_h, ts_h)

    # ---- model selection: RH = SH / (SH + SF) > 0.40 (Initialize, :124-134)
    rh = score_h / jnp.maximum(score_h + score_f, 1e-9)
    use_h = rh > 0.40
    ok = jnp.where(use_h, ok_h, ok_f)
    T21 = jnp.where(use_h, T21s_h[best_h], T21s_f[best_f])
    Xw = jnp.where(use_h, tris_h.Xw[best_h], Xws_f[best_f])
    mask = jnp.where(use_h, masks_h[best_h], ms_f[best_f])
    n_good = jnp.where(use_h, counts_h[best_h], max_f)
    return InitResult(ok, T21, Xw, mask & ok, n_good)


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
