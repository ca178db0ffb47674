"""Batched RANSAC PnP for relocalization.

The reference relocalizes with EPnP + RANSAC (``src/PnPsolver.cc``,
``Tracking.cc:2231-2392``).  ``_epnp_pose`` re-implements EPnP (Lepetit et al.;
``PnPsolver.cc:375-860``) as a batched closed form: 4 control points from the
principal axes, barycentric coordinates, the 12x12 null-space eigenproblem,
the N=1/2/3 beta initializations from the pairwise-distance system, and a
joint Gauss-Newton refinement of all four betas (``gauss_newton``,
``PnPsolver.cc:741``) — every step vmaps over RANSAC hypotheses.  All
hypotheses are evaluated in one batch (minimal set 4, as the reference's
``SetRansacParameters`` call) and the winner is refined downstream by the
standard LM pose optimizer (the reference likewise runs ``PoseOptimization``
after ``PnPsolver::iterate``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import CameraConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.solvers.linalg import (
    nullvec, smallest_right_singular_vectors,
)


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
    P = nullvec(A).reshape(3, 4)
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


_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _epnp_pose(cam: CameraConfig, Xw, uv, w=None):
    """EPnP closed form from >= 4 correspondences; returns Tcw (7,).

    ``w``: optional (m,) weights — zero rows drop out of every solve, which is
    how the all-inlier refit (the reference's ``PnPsolver::Refine``,
    ``PnPsolver.cc:247-291``) reuses this under jit without dynamic shapes."""
    from fishbirdeyevisualslam_tpu.solvers.sim3_solver import horn_alignment
    from fishbirdeyevisualslam_tpu.geometry import sim3 as sim3_mod

    m = Xw.shape[0]
    if w is None:
        w = jnp.ones((m,), Xw.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    # 4 control points: centroid + principal axes (choose_control_points)
    c0 = jnp.sum(Xw * w[:, None], axis=0) / wsum
    Xc = (Xw - c0) * jnp.sqrt(w)[:, None]
    cov = Xc.T @ Xc / wsum
    w_eval, w_evec = jnp.linalg.eigh(cov)  # ascending
    k = jnp.sqrt(jnp.maximum(w_eval, 1e-10))
    cws = jnp.stack([
        c0,
        c0 + k[2] * w_evec[:, 2],
        c0 + k[1] * w_evec[:, 1],
        c0 + k[0] * w_evec[:, 0],
    ])  # (4, 3)
    # barycentric coordinates (compute_barycentric_coordinates)
    CC = (cws[1:] - cws[0]).T  # (3, 3)
    CCinv = jnp.linalg.inv(CC + 1e-9 * jnp.eye(3, dtype=CC.dtype))
    a123 = (Xw - cws[0]) @ CCinv.T
    alphas = jnp.concatenate([1.0 - a123.sum(-1, keepdims=True), a123], axis=-1)

    # M matrix (fill_M): 2 rows per point, 12 columns (4 control pts x 3)
    u, v = uv[:, 0], uv[:, 1]
    zeros = jnp.zeros((m,), Xw.dtype)
    Mu = jnp.concatenate([
        jnp.stack([alphas[:, j] * cam.fx, zeros, alphas[:, j] * (cam.cx - u)], -1)
        for j in range(4)], axis=-1)
    Mv = jnp.concatenate([
        jnp.stack([zeros, alphas[:, j] * cam.fy, alphas[:, j] * (cam.cy - v)], -1)
        for j in range(4)], axis=-1)
    M = jnp.concatenate([Mu, Mv], axis=0) * jnp.tile(w, 2)[:, None]  # (2m, 12)
    vs = smallest_right_singular_vectors(M, 4).reshape(4, 4, 3)
    # 4 null-space candidates (smallest-first), each (4 ctrl, 3)

    # pairwise control-point squared distances in world
    dw2 = jnp.stack([jnp.sum((cws[i] - cws[j]) ** 2) for i, j in _PAIRS])
    dv = jnp.stack([vs[:, i, :] - vs[:, j, :] for i, j in _PAIRS])  # (6, 4, 3)

    def ctrl_cam(beta):
        return jnp.einsum("k,kij->ij", beta, vs)  # (4, 3)

    def resid(beta):
        diff = jnp.einsum("k,pkj->pj", beta, dv)  # (6, 3)
        return jnp.sum(diff * diff, axis=-1) - dw2

    # beta initializations (find_betas_approx_1/2/3)
    dv0n2 = jnp.sum(dv[:, 0, :] ** 2, axis=-1)
    b1 = jnp.sum(jnp.sqrt(dw2) * jnp.sqrt(dv0n2)) / jnp.maximum(jnp.sum(dv0n2), 1e-12)
    beta_a = jnp.array([1.0, 0.0, 0.0, 0.0]) * b1

    # N=2: unknowns (b11, b12, b22); L (6, 3)
    L2 = jnp.stack([
        jnp.sum(dv[:, 0, :] ** 2, -1),
        2.0 * jnp.sum(dv[:, 0, :] * dv[:, 1, :], -1),
        jnp.sum(dv[:, 1, :] ** 2, -1),
    ], axis=-1)
    b2v = jnp.linalg.solve(L2.T @ L2 + 1e-9 * jnp.eye(3), L2.T @ dw2)
    bb1 = jnp.sqrt(jnp.abs(b2v[0]))
    bb2 = jnp.sqrt(jnp.abs(b2v[2])) * jnp.sign(b2v[1]) * jnp.sign(b2v[0])
    beta_b = jnp.array([1.0, 0.0, 0.0, 0.0]) * bb1 + jnp.array([0.0, 1.0, 0.0, 0.0]) * bb2

    # N=3: unknowns (b11, b12, b22, b13, b23); L (6, 5)
    L3 = jnp.stack([
        jnp.sum(dv[:, 0, :] ** 2, -1),
        2.0 * jnp.sum(dv[:, 0, :] * dv[:, 1, :], -1),
        jnp.sum(dv[:, 1, :] ** 2, -1),
        2.0 * jnp.sum(dv[:, 0, :] * dv[:, 2, :], -1),
        2.0 * jnp.sum(dv[:, 1, :] * dv[:, 2, :], -1),
    ], axis=-1)
    b3v = jnp.linalg.solve(L3.T @ L3 + 1e-9 * jnp.eye(5), L3.T @ dw2)
    cb1 = jnp.sqrt(jnp.abs(b3v[0]))
    cb2 = jnp.sqrt(jnp.abs(b3v[2])) * jnp.sign(b3v[1]) * jnp.sign(b3v[0])
    cb3 = jnp.where(jnp.abs(cb1) > 1e-12, b3v[3] / jnp.maximum(2.0 * cb1, 1e-12), 0.0) \
        * jnp.sign(b3v[0])
    beta_c = (jnp.array([1.0, 0, 0, 0]) * cb1 + jnp.array([0.0, 1, 0, 0]) * cb2
              + jnp.array([0.0, 0, 1, 0]) * cb3)

    def refine_and_pose(beta0):
        # joint Gauss-Newton over all 4 betas (gauss_newton, PnPsolver.cc:741)
        def gn_step(beta, _):
            r = resid(beta)
            J = jax.jacfwd(resid)(beta)  # (6, 4)
            H = J.T @ J + 1e-9 * jnp.eye(4)
            beta = beta - jnp.linalg.solve(H, J.T @ r)
            return beta, None
        beta, _ = jax.lax.scan(gn_step, beta0, None, length=6)
        cc = ctrl_cam(beta)
        pc = alphas @ cc  # (m, 3) camera coords
        flip = jnp.sign(jnp.sum(pc[:, 2] * w))
        pc = pc * flip
        S = horn_alignment(pc, Xw, weights=w, fix_scale=True)
        T = sim3_mod.to_se3(S)
        e2 = _reproj_err(cam, T, Xw, uv)
        return T, jnp.sum(e2 * w)

    Ts, errs = jax.vmap(refine_and_pose)(jnp.stack([beta_a, beta_b, beta_c]))
    best = jnp.argmin(errs)
    return Ts[best]


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
    (``Tracking.cc:2276``); minimal solver is EPnP with a 4-point set."""
    n = Xw.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_iters, n)) + logits[None, :]
    _, samples = jax.lax.top_k(g, 4)

    def one(idx):
        T = _epnp_pose(cam, Xw[idx], uv[idx])
        e2 = _reproj_err(cam, T, Xw, uv)
        inl = valid & (e2 < chi2_thresh * 4.0)  # generous gate pre-refinement
        return T, jnp.sum(inl.astype(jnp.int32))

    Ts, counts = jax.vmap(one)(samples)
    best = jnp.argmax(counts)
    T = Ts[best]
    e2 = _reproj_err(cam, T, Xw, uv)
    inl = valid & (e2 < chi2_thresh * 4.0)
    n_in = jnp.sum(inl.astype(jnp.int32))

    # all-inlier EPnP refit (the reference's PnPsolver::Refine), kept only if
    # it does not lose inliers; two re-gate->refit rounds — the second round
    # re-solves on the (usually larger) inlier set the first round recovered
    for _ in range(2):
        T_r = _epnp_pose(cam, Xw, uv, w=inl.astype(Xw.dtype))
        e2_r = _reproj_err(cam, T_r, Xw, uv)
        inl_r = valid & (e2_r < chi2_thresh * 4.0)
        n_r = jnp.sum(inl_r.astype(jnp.int32))
        better = n_r >= n_in
        T = jnp.where(better, T_r, T)
        inl = jnp.where(better, inl_r, inl)
        n_in = jnp.where(better, n_r, n_in)
    return PnPResult(T, inl, n_in, n_in >= min_inliers)
