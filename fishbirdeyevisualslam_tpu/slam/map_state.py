"""Functional map state: fixed-capacity struct-of-arrays with validity masks.

This replaces the reference's pointer graph (``Map``/``KeyFrame``/``MapPoint``/
``MapPointBird`` with per-object mutexes, ``src/Map.h:74-77``) by one immutable
pytree passed through jitted update functions (SURVEY.md §7 design stance):

  * keyframe insertion  = writing into a free slot (no allocation, no locks),
  * culling             = validity-mask flips,
  * covisibility        = segment-sums over the observation arrays,
  * every consumer (matching, BA, loop closing) reads padded fixed-shape arrays.

Observations are stored landmark-major — ``obs_kf``/``obs_feat`` of shape
(P, M) — which is exactly the layout ``solvers.ba.PointBlocks`` consumes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3


class MapState(NamedTuple):
    # --- keyframes -----------------------------------------------------------
    kf_Tcw: jnp.ndarray        # (K, 7) world-to-camera pose
    kf_valid: jnp.ndarray      # (K,) bool
    kf_is_init: jnp.ndarray    # (K,) bool — gauge-fixed in local BA (KeyFrame::isInit)
    kf_odom: jnp.ndarray       # (K, 3) raw wheel odometry (x, y, theta)
    kf_timestamp: jnp.ndarray  # (K,)
    kf_frame_id: jnp.ndarray   # (K,) int32 source frame id
    kf_seq: jnp.ndarray        # (K,) int32 insertion sequence number (-1 free).
                               # Slots RECYCLE (culled capacity returns), so slot
                               # order is NOT temporal order; every consumer that
                               # needs "earlier"/"consecutive" (odometry chains,
                               # spanning tree, culling recency) orders by seq.
    # per-KF front keypoints (undistorted uv, octave, packed descriptors)
    kf_uv: jnp.ndarray         # (K, F, 2)
    kf_octave: jnp.ndarray     # (K, F) int32
    kf_desc: jnp.ndarray       # (K, F, 8) uint32
    kf_kp_valid: jnp.ndarray   # (K, F) bool
    kf_mp: jnp.ndarray         # (K, F) int32 map-point id per feature, -1 none
    kf_words: jnp.ndarray      # (K, F) int32 BoW word id per feature (ops.bow)
    # per-KF bird keypoints
    kf_bird_cam: jnp.ndarray   # (K, FB, 3) camera-frame metric points
    kf_bird_desc: jnp.ndarray  # (K, FB, 8) uint32
    kf_bird_octave: jnp.ndarray# (K, FB) int32
    kf_bird_kp_valid: jnp.ndarray  # (K, FB) bool
    kf_bird_mp: jnp.ndarray    # (K, FB) int32 bird-point id per feature, -1 none
    # --- front map points ----------------------------------------------------
    mp_pos: jnp.ndarray        # (P, 3)
    mp_desc: jnp.ndarray       # (P, 8) uint32 distinctive descriptor
    mp_desc_pm1: jnp.ndarray   # (P, 256) bf16 — the SAME descriptors expanded
                               # to the +/-1 MXU operand, maintained at write
                               # time so the per-frame matchers hand the Pallas
                               # kernel an already-materialized HBM operand
                               # (re-expanding + padding 8 MB per match call
                               # was the round-2 staging overhead)
    mp_valid: jnp.ndarray      # (P,) bool
    mp_normal: jnp.ndarray     # (P, 3) mean viewing direction
    mp_min_dist: jnp.ndarray   # (P,) scale-invariance range
    mp_max_dist: jnp.ndarray   # (P,)
    mp_ref_kf: jnp.ndarray     # (P,) int32
    mp_visible: jnp.ndarray    # (P,) int32 — found/visible ratio culling
    mp_found: jnp.ndarray      # (P,) int32
    mp_first_kf: jnp.ndarray   # (P,) int32 — recent-point culling window
    obs_kf: jnp.ndarray        # (P, M) int32
    obs_feat: jnp.ndarray      # (P, M) int32
    obs_valid: jnp.ndarray     # (P, M) bool
    # --- bird map points -----------------------------------------------------
    bp_pos: jnp.ndarray        # (PB, 3)
    bp_desc: jnp.ndarray       # (PB, 8)
    bp_desc_pm1: jnp.ndarray   # (PB, 256) bf16 expanded matmul operand
    bp_valid: jnp.ndarray      # (PB,) bool
    bp_ref_kf: jnp.ndarray     # (PB,) int32
    bp_birth: jnp.ndarray      # (PB,) int32 kf_seq of the creating KF (age culling)
    bp_gen: jnp.ndarray        # (PB,) int32 slot generation — bumped on every
                               # allocation (reset_bird_slots) so a freed+
                               # recycled slot is distinguishable from the
                               # landmark an async-mapping snapshot saw there
                               # (a bp_valid diff alone aliases them)
    bobs_kf: jnp.ndarray       # (PB, MB) int32
    bobs_feat: jnp.ndarray     # (PB, MB) int32
    bobs_valid: jnp.ndarray    # (PB, MB) bool
    # --- counters ------------------------------------------------------------
    n_kf: jnp.ndarray          # () int32 slot high-water mark (NOT a KF count:
                               # slots below it may be free after culling)
    kf_counter: jnp.ndarray    # () int32 total KF insertions ever (monotone);
                               # the newest KF has kf_seq == kf_counter - 1
    n_mp: jnp.ndarray          # () int32 count of live front points (diagnostic)
    n_bp: jnp.ndarray          # () int32 count of live bird points (diagnostic)
    n_pressure_evicted: jnp.ndarray  # () int32 cumulative landmarks retired by
                               # relieve_point_pressure (valve-fire diagnostic)

    @property
    def K(self):
        return self.kf_Tcw.shape[0]


def empty_map(cfg: SystemConfig) -> MapState:
    c = cfg.capacity
    K, F, FB = c.max_keyframes, c.max_front_kp, c.max_bird_kp
    P, PB, M, MB = c.max_points, c.max_bird_points, c.max_obs_per_point, 8
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        kf_Tcw=jnp.tile(se3.identity()[None], (K, 1)),
        kf_valid=jnp.zeros(K, bool),
        kf_is_init=jnp.zeros(K, bool),
        kf_odom=jnp.zeros((K, 3), f32),
        kf_timestamp=jnp.zeros(K, f32),
        kf_frame_id=jnp.full(K, -1, i32),
        kf_seq=jnp.full(K, -1, i32),
        kf_uv=jnp.zeros((K, F, 2), f32),
        kf_octave=jnp.zeros((K, F), i32),
        kf_desc=jnp.zeros((K, F, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((K, F), bool),
        kf_mp=jnp.full((K, F), -1, i32),
        kf_words=jnp.zeros((K, F), i32),
        kf_bird_cam=jnp.zeros((K, FB, 3), f32),
        kf_bird_desc=jnp.zeros((K, FB, 8), jnp.uint32),
        kf_bird_octave=jnp.zeros((K, FB), i32),
        kf_bird_kp_valid=jnp.zeros((K, FB), bool),
        kf_bird_mp=jnp.full((K, FB), -1, i32),
        mp_pos=jnp.zeros((P, 3), f32),
        mp_desc=jnp.zeros((P, 8), jnp.uint32),
        mp_desc_pm1=jnp.full((P, 256), -1.0, jnp.bfloat16),
        mp_valid=jnp.zeros(P, bool),
        mp_normal=jnp.zeros((P, 3), f32),
        mp_min_dist=jnp.zeros(P, f32),
        mp_max_dist=jnp.full(P, 1e9, f32),
        mp_ref_kf=jnp.zeros(P, i32),
        mp_visible=jnp.ones(P, i32),
        mp_found=jnp.ones(P, i32),
        mp_first_kf=jnp.zeros(P, i32),
        obs_kf=jnp.zeros((P, M), i32),
        obs_feat=jnp.zeros((P, M), i32),
        obs_valid=jnp.zeros((P, M), bool),
        bp_pos=jnp.zeros((PB, 3), f32),
        bp_desc=jnp.zeros((PB, 8), jnp.uint32),
        bp_desc_pm1=jnp.full((PB, 256), -1.0, jnp.bfloat16),
        bp_valid=jnp.zeros(PB, bool),
        bp_ref_kf=jnp.zeros(PB, i32),
        bp_birth=jnp.zeros(PB, i32),
        bp_gen=jnp.zeros(PB, i32),
        bobs_kf=jnp.zeros((PB, MB), i32),
        bobs_feat=jnp.zeros((PB, MB), i32),
        bobs_valid=jnp.zeros((PB, MB), bool),
        n_kf=jnp.int32(0),
        kf_counter=jnp.int32(0),
        n_mp=jnp.int32(0),
        n_bp=jnp.int32(0),
        n_pressure_evicted=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Derived structures
# ---------------------------------------------------------------------------


def covisibility_counts(m: MapState) -> jnp.ndarray:
    """(K, K) int32: number of shared front map points between KF pairs — the
    covisibility graph (reference ``KeyFrame::UpdateConnections`` weight, th=15).

    Built as ONE MXU matmul: A (K, P) = "KF k observes landmark p" (binary,
    any obs slot), C = A·Aᵀ with f32 accumulation — exact for 0/1 operands.
    The previous scatter-add over (P, M, M) slot pairs lowered to a SERIAL
    TPU scatter of P·M² elements (8.4M at the shipped capacities) and
    dominated every loop-detect probe; the matmul form is the same
    one-hot-contraction rewrite that fixed the BA assembly in round 4.
    (Binary membership is also the reference's semantics — a shared POINT
    counts once however many obs slots reference it.)
    """
    K = m.K
    A = _obs_matrix(m.obs_kf, m.obs_valid & m.mp_valid[:, None], K)
    C = jax.lax.dot_general(A, A, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(jnp.int32)
    C = C - jnp.diag(jnp.diag(C))  # no self-edges
    return C


def _obs_matrix(obs_kf, obs_ok, K: int) -> jnp.ndarray:
    """(K, P) bf16 0/1 KF-observes-landmark membership from landmark-major obs
    blocks — M fused elementwise compare passes, no scatter."""
    P, M = obs_kf.shape
    ks = jnp.arange(K, dtype=jnp.int32)[:, None]
    hit = jnp.zeros((K, P), bool)
    for s in range(M):
        hit = hit | ((obs_kf[:, s][None, :] == ks) & obs_ok[:, s][None, :])
    return hit.astype(jnp.bfloat16)


def bird_covisibility_counts(m: MapState) -> jnp.ndarray:
    """(K, K): shared MapPointBird counts (``KeyFrame::UpdateBirdConnections``,
    th=2, ``src/KeyFrame.cc:418-562``)."""
    K = m.K
    A = _obs_matrix(m.bobs_kf, m.bobs_valid & m.bp_valid[:, None], K)
    C = jax.lax.dot_general(A, A, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(jnp.int32)
    return C - jnp.diag(jnp.diag(C))


def point_obs_count(m: MapState) -> jnp.ndarray:
    return jnp.sum((m.obs_valid & m.mp_valid[:, None]).astype(jnp.int32), axis=1)


def temporal_perm(m: MapState) -> jnp.ndarray:
    """(K,) permutation of KF slots sorted by insertion order, valid KFs first.

    With slot recycling, slot index carries NO temporal meaning; consumers that
    need the keyframe TIMELINE (odometry chain/skip edges in local/global BA,
    spanning-tree "earlier", culling recency) go through this: ``perm[r]`` is
    the slot of the r-th oldest LIVE keyframe.  Invalid slots sort to the end.
    """
    key = jnp.where(m.kf_valid, m.kf_seq, jnp.iinfo(jnp.int32).max)
    return jnp.argsort(key).astype(jnp.int32)


def reassign_orphan_refs(m: MapState) -> MapState:
    """Re-home ``mp_ref_kf``/``bp_ref_kf`` entries whose reference KF died.

    The reference updates ``MapPoint::mpRefKF`` when a KeyFrame is erased
    (``KeyFrame::SetBadFlag``); with slot recycling a stale ref would silently
    bind the landmark to whatever UNRELATED keyframe reuses the slot — the
    scale-range and loop-correction transport would then be garbage.  New ref =
    the oldest valid observing KF (falls back to the oldest live KF for
    observation-less points, which the cullers retire anyway).
    """
    K = m.K
    big = jnp.iinfo(jnp.int32).max
    seq_of = jnp.where(m.kf_valid, m.kf_seq, big)
    # oldest valid observer per front point
    obs_seq = jnp.where(m.obs_valid & m.kf_valid[m.obs_kf], seq_of[m.obs_kf], big)
    best = jnp.argmin(obs_seq, axis=1)
    cand = m.obs_kf[jnp.arange(m.obs_kf.shape[0]), best]
    has = jnp.min(obs_seq, axis=1) < big
    oldest_live = jnp.argmin(seq_of).astype(jnp.int32)
    mp_ref = jnp.where(m.kf_valid[jnp.clip(m.mp_ref_kf, 0, K - 1)], m.mp_ref_kf,
                       jnp.where(has, cand, oldest_live))
    bobs_seq = jnp.where(m.bobs_valid & m.kf_valid[m.bobs_kf], seq_of[m.bobs_kf], big)
    bbest = jnp.argmin(bobs_seq, axis=1)
    bcand = m.bobs_kf[jnp.arange(m.bobs_kf.shape[0]), bbest]
    bhas = jnp.min(bobs_seq, axis=1) < big
    bp_ref = jnp.where(m.kf_valid[jnp.clip(m.bp_ref_kf, 0, K - 1)], m.bp_ref_kf,
                       jnp.where(bhas, bcand, oldest_live))
    return m._replace(mp_ref_kf=mp_ref.astype(jnp.int32),
                      bp_ref_kf=bp_ref.astype(jnp.int32))


def alloc_slots(valid_mask, want):
    """Free-slot allocation with recycling (VERDICT round-1 missing #2).

    The reference's maps grow and shrink indefinitely (``src/Map.cc`` point/KF
    deletion); fixed-capacity arrays must REUSE culled slots or point creation
    permanently dies once the monotone cursor saturates.  First-fit over the
    validity mask: the r-th wanted entry gets the r-th invalid slot.

    valid_mask: (P,) bool occupancy.  want: (B,) bool entries needing a slot.
    Returns (dest (B,) int32, can (B,) bool).  Slot P-1 is reserved as the
    scatter dump for not-allocated entries and is never handed out (callers
    write with ``jnp.where(can, new, old)`` so dumps preserve the old value).
    """
    P = valid_mask.shape[0]
    B = want.shape[0]
    free = ~valid_mask
    free = free.at[P - 1].set(False)
    # first-fit free slots via ONE sort (jnp.nonzero's iota scatter is serial
    # on TPU — ~0.2 ms per call at PB=16384, and this runs per FRAME inside
    # bird_frame_maintenance)
    key = jnp.where(free, jnp.arange(P, dtype=jnp.int32), P)
    slots = jax.lax.sort(key)[:B]
    free_slots = jnp.where(slots < P, slots, -1)
    order = jnp.cumsum(want.astype(jnp.int32)) - 1
    slot = free_slots[jnp.clip(order, 0, B - 1)]
    can = want & (slot >= 0)
    dest = jnp.where(can, slot, P - 1).astype(jnp.int32)
    return dest, can


def reset_point_slots(m: MapState, dest, can, first_kf) -> MapState:
    """Clear per-point state of front slots being recycled: stale observation
    rows, found/visible counters, scale range, birth KF."""
    P, M = m.obs_kf.shape
    row = can[:, None]
    return m._replace(
        obs_valid=m.obs_valid.at[dest].set(
            jnp.where(row, False, m.obs_valid[dest])),
        mp_found=m.mp_found.at[dest].set(jnp.where(can, 1, m.mp_found[dest])),
        mp_visible=m.mp_visible.at[dest].set(jnp.where(can, 1, m.mp_visible[dest])),
        mp_min_dist=m.mp_min_dist.at[dest].set(jnp.where(can, 0.0, m.mp_min_dist[dest])),
        mp_max_dist=m.mp_max_dist.at[dest].set(jnp.where(can, 1e9, m.mp_max_dist[dest])),
        mp_first_kf=m.mp_first_kf.at[dest].set(jnp.where(can, first_kf, m.mp_first_kf[dest])),
        mp_normal=m.mp_normal.at[dest].set(jnp.where(row, 0.0, m.mp_normal[dest])),
    )


def reset_bird_slots(m: MapState, dest, can) -> MapState:
    """Clear stale bird observation rows of slots being recycled and bump the
    slot generation so async snapshots can tell a recycled slot from the
    landmark they saw there (ADVICE r4: a freed-then-reallocated slot whose
    bp_valid matched the snapshot was replayed as 'keep', attaching the new
    frame-born landmark's observations to the unrelated old landmark)."""
    return m._replace(
        bobs_valid=m.bobs_valid.at[dest].set(
            jnp.where(can[:, None], False, m.bobs_valid[dest])),
        bp_gen=m.bp_gen.at[dest].add(can.astype(jnp.int32)),
    )


def scrub_stale_refs(m: MapState) -> MapState:
    """Drop ``kf_mp``/``kf_bird_mp`` entries pointing at invalidated points.

    Mandatory before slot recycling: a stale reference into a reused slot would
    silently alias a DIFFERENT live landmark.  Also refreshes the live-count
    diagnostics.
    """
    P = m.mp_pos.shape[0]
    PB = m.bp_pos.shape[0]
    kf_mp = jnp.where(
        (m.kf_mp >= 0) & m.mp_valid[jnp.clip(m.kf_mp, 0, P - 1)], m.kf_mp, -1)
    kf_bird_mp = jnp.where(
        (m.kf_bird_mp >= 0) & m.bp_valid[jnp.clip(m.kf_bird_mp, 0, PB - 1)],
        m.kf_bird_mp, -1)
    return m._replace(
        kf_mp=kf_mp, kf_bird_mp=kf_bird_mp,
        n_mp=jnp.sum(m.mp_valid.astype(jnp.int32)),
        n_bp=jnp.sum(m.bp_valid.astype(jnp.int32)),
    )


def add_observation(m: MapState, pt_idx, kf_idx, feat_idx, valid) -> MapState:
    """Scatter a batch of (point, kf, feature) observations into free obs slots.

    pt_idx/kf_idx/feat_idx: (B,) int32; valid: (B,) bool.  Each point's first
    invalid slot is used; if a point receives multiple new obs in one batch they
    land in successive slots via the rank-among-duplicates trick.
    """
    P, M = m.obs_kf.shape
    B = pt_idx.shape[0]
    safe_pt = jnp.clip(pt_idx, 0, P - 1)
    # current fill level per point
    fill = jnp.sum(m.obs_valid.astype(jnp.int32), axis=1)  # (P,)
    # rank of each batch entry among same-point entries before it
    same = (pt_idx[None, :] == pt_idx[:, None]) & valid[None, :] & valid[:, None]
    rank = jnp.sum(jnp.tril(same, -1), axis=1)  # (B,)
    slot = jnp.clip(fill[safe_pt] + rank, 0, M - 1)
    ok = valid & (fill[safe_pt] + rank < M)
    # scatter (drop invalid into slot M-1 of point P-1 then restore)
    upd_pt = jnp.where(ok, safe_pt, P - 1)
    upd_slot = jnp.where(ok, slot, M - 1)
    obs_kf = m.obs_kf.at[upd_pt, upd_slot].set(
        jnp.where(ok, kf_idx, m.obs_kf[upd_pt, upd_slot]))
    obs_feat = m.obs_feat.at[upd_pt, upd_slot].set(
        jnp.where(ok, feat_idx, m.obs_feat[upd_pt, upd_slot]))
    obs_valid = m.obs_valid.at[upd_pt, upd_slot].set(
        jnp.where(ok, True, m.obs_valid[upd_pt, upd_slot]))
    return m._replace(obs_kf=obs_kf, obs_feat=obs_feat, obs_valid=obs_valid)


def add_bird_observation(m: MapState, pt_idx, kf_idx, feat_idx, valid) -> MapState:
    PB, MB = m.bobs_kf.shape
    safe_pt = jnp.clip(pt_idx, 0, PB - 1)
    fill = jnp.sum(m.bobs_valid.astype(jnp.int32), axis=1)
    same = (pt_idx[None, :] == pt_idx[:, None]) & valid[None, :] & valid[:, None]
    rank = jnp.sum(jnp.tril(same, -1), axis=1)
    slot = jnp.clip(fill[safe_pt] + rank, 0, MB - 1)
    ok = valid & (fill[safe_pt] + rank < MB)
    upd_pt = jnp.where(ok, safe_pt, PB - 1)
    upd_slot = jnp.where(ok, slot, MB - 1)
    bobs_kf = m.bobs_kf.at[upd_pt, upd_slot].set(
        jnp.where(ok, kf_idx, m.bobs_kf[upd_pt, upd_slot]))
    bobs_feat = m.bobs_feat.at[upd_pt, upd_slot].set(
        jnp.where(ok, feat_idx, m.bobs_feat[upd_pt, upd_slot]))
    bobs_valid = m.bobs_valid.at[upd_pt, upd_slot].set(
        jnp.where(ok, True, m.bobs_valid[upd_pt, upd_slot]))
    return m._replace(bobs_kf=bobs_kf, bobs_feat=bobs_feat, bobs_valid=bobs_valid)
