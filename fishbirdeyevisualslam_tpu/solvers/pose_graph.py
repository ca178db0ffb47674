"""Pose-graph (essential-graph) optimization for loop closing.

Re-implements ``Optimizer::OptimizeEssentialGraph`` (``src/Optimizer.cc:
1168-1558``) in the fixed-scale regime the reference actually runs
(``bFixScale = true`` -> SE3 vertices).  The edge set mirrors the reference:
spanning-tree edges, high-covisibility edges (minFeat >= 100), loop edges, and
the MODIFIED bird-covisibility fallback for keyframes with no front edges
(``Optimizer.cc:1390-1422``).

Implementation: this is exactly a relative-pose factor graph, i.e. the odometry
machinery of ``solvers.ba`` with no landmarks — one call to ``bundle_adjust``
with empty point blocks.  After optimization, landmarks are rigidly carried by
their reference keyframe's correction (the reference transforms each point by
``Tcorrected^-1 * Told`` of its reference KF, ``Optimizer.cc:1515-1556``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.solvers.ba import (
    PointBlocks, OdomEdges, bundle_adjust,
)


def _empty_blocks(dim: int) -> PointBlocks:
    return PointBlocks(
        Xw=jnp.zeros((1, 3)),
        kf_idx=jnp.zeros((1, 1), jnp.int32),
        meas=jnp.zeros((1, 1, dim)),
        inv_sigma2=jnp.ones((1, 1)),
        valid=jnp.zeros((1, 1), bool),
        point_valid=jnp.zeros((1,), bool),
    )


def optimize_pose_graph(
    cfg: SystemConfig,
    poses,            # (K, 7) current (possibly loop-corrected seed) poses
    fixed,            # (K,) bool — the loop KF is fixed (Optimizer.cc:1217)
    edges: OdomEdges, # relative-pose constraints (measured from pre-loop poses)
    n_iters: int = 20,
):
    """SE3 pose-graph LM.  ``edges.T_meas`` are the relative poses measured at
    edge-creation time; the optimizer distributes the loop correction."""
    out = bundle_adjust(
        cfg.camera, cfg.ba, poses, fixed,
        _empty_blocks(2), _empty_blocks(3), edges,
        n_iters_1=n_iters, n_iters_2=0,
    )
    return out.poses


def carry_points(points, ref_kf, poses_old, poses_new):
    """Rigidly transport landmarks with their reference KF's correction:
    X_new = Twc_new * Tcw_old * X_old  per point (``Optimizer.cc:1515-1556``)."""
    T_old = poses_old[ref_kf]           # (P, 7) Tcw before
    T_new = poses_new[ref_kf]
    corr = jax.vmap(lambda a, b: se3.compose(se3.inverse(b), a))(T_old, T_new)
    # corr = Twc_new * Tcw_old
    return jax.vmap(se3.transform)(corr, points)


def build_pose_graph_edges(
    cfg: SystemConfig,
    poses_meas,        # (K, 7) poses at measurement time (pre-correction)
    covis,             # (K, K) covisibility counts
    bird_covis,        # (K, K) bird covisibility counts
    kf_valid,          # (K,)
    loop_i, loop_j, loop_T,  # loop edges: (L,) + (L, 7) measured relative poses
    min_feat: int = 100,
    kf_seq=None,       # (K,) insertion sequence — "earlier" means OLDER, not a
                       # lower slot index (slots recycle)
):
    """Edge set of the essential graph: covisibility spanning tree, strong
    covisibility (>= min_feat), bird-covisibility fallback for front-starved
    KFs, and the provided loop edges."""
    K = poses_meas.shape[0]
    idx = jnp.arange(K, dtype=jnp.int32)
    if kf_seq is None:
        kf_seq = idx

    # spanning tree: parent(k) = earlier (by SEQ) KF with max front covisibility
    # (``KeyFrame::UpdateConnections``' ChangeParent target); orphans repaired
    # by bird covisibility, then by the nearest earlier seq — the reference's
    # orphan repair in ``KeyFrame::UpdateBirdConnections`` (KeyFrame.cc:447-479)
    earlier = (kf_seq[None, :] < kf_seq[:, None]) & kf_valid[None, :] & kf_valid[:, None]
    wf = jnp.where(earlier, covis, -1)
    wb = jnp.where(earlier, bird_covis, -1)
    pf = jnp.argmax(wf, axis=1).astype(jnp.int32)
    pb = jnp.argmax(wb, axis=1).astype(jnp.int32)
    # nearest-earlier fallback: among earlier valid KFs, the one with max seq
    seq_masked = jnp.where(earlier, kf_seq[None, :], -1)
    p_near = jnp.argmax(seq_masked, axis=1).astype(jnp.int32)
    parent = jnp.where(jnp.max(wf, axis=1) > 0, pf,
                       jnp.where(jnp.max(wb, axis=1) > 0, pb, p_near))
    has_earlier = jnp.any(earlier, axis=1)
    ci = idx
    cj = parent
    cvalid = kf_valid[ci] & kf_valid[cj] & has_earlier & (ci != cj)

    # strong covisibility: EVERY pair sharing >= min_feat points (the reference
    # keeps all of them, ``Optimizer.cc:1264-1298``; round 1 capped at the top-4
    # partners, which distributes large corrections poorly on long graphs)
    strong = (covis >= min_feat) & kf_valid[:, None] & kf_valid[None, :]
    # bird fallback where no strong front edge exists (Optimizer.cc:1390-1422)
    has_front = jnp.any(strong, axis=1)
    bird_edge = (bird_covis >= 2) & (~has_front)[:, None] & kf_valid[:, None] & kf_valid[None, :]
    adj = jnp.triu(strong | bird_edge, 1)
    ei = jnp.repeat(idx, K)
    ej = jnp.tile(idx, K)
    evalid = adj.reshape(-1)
    # per-edge information scaled by covisibility weight (EXTENSION: the
    # reference uses identity information for every essential-graph edge; a
    # weight-proportional info lets well-constrained pairs resist distortion
    # while weak ones absorb the correction), loop edges up-weighted 4x
    cw = (covis + bird_covis).reshape(-1).astype(jnp.float32)
    einfo = 100.0 * jnp.clip(cw / float(min_feat), 1.0, 4.0)

    all_i = jnp.concatenate([ci, ei, loop_i])
    all_j = jnp.concatenate([cj, ej, loop_j])
    all_valid = jnp.concatenate([cvalid, evalid, jnp.ones_like(loop_i, bool)])
    T_rel = jax.vmap(lambda a, b: se3.compose(poses_meas[a], se3.inverse(poses_meas[b])))(all_i, all_j)
    n_non_loop = all_i.shape[0] - loop_T.shape[0]
    T_rel = T_rel.at[n_non_loop:].set(loop_T)
    info = jnp.concatenate([
        jnp.full(ci.shape[0], 100.0),
        einfo,
        jnp.full(loop_i.shape[0], 400.0),
    ])
    return OdomEdges(all_i, all_j, T_rel, info, all_valid)
