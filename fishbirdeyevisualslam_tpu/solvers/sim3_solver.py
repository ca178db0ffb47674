"""Closed-form Sim3 / SE3 alignment with batched RANSAC.

Re-implements ``Sim3Solver`` (``src/Sim3Solver.cc``): Horn's absolute-orientation
method on 3-point minimal samples, scored by reprojection-style 3D residuals;
``bFixScale`` pins s = 1 (the reference's default, ``src/System.cc:102``).
All RANSAC hypotheses are computed and scored in one vmapped batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.geometry import se3, sim3


class Sim3Result(NamedTuple):
    S12: jnp.ndarray      # (8,) sim3 mapping frame-2 points into frame 1
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray
    success: jnp.ndarray


def horn_alignment(p1, p2, weights=None, fix_scale: bool = True):
    """Closed-form similarity p1 ~ s R p2 + t over matched 3D sets (N, 3).

    Horn 1987 via SVD of the weighted covariance (equivalent to the quaternion
    method the reference uses, ``Sim3Solver::ComputeSim3``).
    """
    w = jnp.ones(p1.shape[0], p1.dtype) if weights is None else weights
    wsum = jnp.maximum(w.sum(), 1e-9)
    c1 = jnp.sum(p1 * w[:, None], axis=0) / wsum
    c2 = jnp.sum(p2 * w[:, None], axis=0) / wsum
    q1 = p1 - c1
    q2 = p2 - c2
    H = jnp.einsum("n,ni,nj->ij", w, q2, q1)  # maps 2 -> 1
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    R = Vt.T @ D @ U.T
    if fix_scale:
        s = jnp.array(1.0, p1.dtype)
    else:
        var2 = jnp.sum(w[:, None] * q2 * q2) / wsum
        s = jnp.sum(S * jnp.diag(D)) / jnp.maximum(var2 * wsum, 1e-9)
    t = c1 - s * (R @ c2)
    return sim3.make(se3.matrix_to_quat(R), t, s[None] if s.ndim == 0 else s)


def ransac_sim3(
    p1, p2, valid, key,
    n_iters: int = 128,
    inlier_thresh: float = 0.3,
    min_inliers: int = 20,
    fix_scale: bool = True,
) -> Sim3Result:
    """Batched RANSAC over 3-point samples; final model refit on all inliers."""
    n = p1.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_iters, n)) + logits[None, :]
    _, samples = jax.lax.top_k(g, 3)  # (iters, 3)

    def one(idx):
        S = horn_alignment(p1[idx], p2[idx], fix_scale=fix_scale)
        d = jnp.linalg.norm(p1 - sim3.transform(S, p2), axis=-1)
        inl = valid & (d < inlier_thresh)
        return S, jnp.sum(inl.astype(jnp.int32))

    Ss, counts = jax.vmap(one)(samples)
    best = jnp.argmax(counts)
    S_best = Ss[best]
    d = jnp.linalg.norm(p1 - sim3.transform(S_best, p2), axis=-1)
    inl = valid & (d < inlier_thresh)
    # refit on inliers
    S_ref = horn_alignment(p1, p2, weights=inl.astype(p1.dtype), fix_scale=fix_scale)
    d2 = jnp.linalg.norm(p1 - sim3.transform(S_ref, p2), axis=-1)
    inl2 = valid & (d2 < inlier_thresh)
    n_in = jnp.sum(inl2.astype(jnp.int32))
    return Sim3Result(S_ref, inl2, n_in, n_in >= min_inliers)
