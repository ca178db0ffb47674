"""System facade: the host-side orchestration of the SLAM pipeline.

The analog of ``System`` + the ``Tracking`` thread body (``src/System.cc``,
``src/Tracking.cc:479-770``): holds the functional map state, drives the jitted
device steps, implements the NOT_INITIALIZED / OK / LOST state machine, the
keyframe policy, and per-frame trajectory bookkeeping.  The reference's
LocalMapping thread work (triangulation, culling, local BA) runs synchronously
after keyframe insertion — a deterministic pipeline instead of mutex+queue
interleaving (SURVEY.md §5 asynchrony note).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3, ipm, odometry as odo
from fishbirdeyevisualslam_tpu.slam import map_state as ms
from fishbirdeyevisualslam_tpu.slam import tracking as tr
from fishbirdeyevisualslam_tpu.slam import loop_closing as lc
from fishbirdeyevisualslam_tpu.slam.frame import Frame, build_frame
from fishbirdeyevisualslam_tpu.ops import bow as bow_ops
from fishbirdeyevisualslam_tpu.io.tracing import Tracer


@dataclasses.dataclass
class TrajectoryEntry:
    """Per-frame pose stored RELATIVE to its reference keyframe (the reference
    records Tcr and recomposes at export so later BA / loop corrections
    propagate to the whole trajectory, ``Tracking.cc:752-768``,
    ``System.cc:384-470``)."""

    timestamp: float
    T_rel: np.ndarray         # (7,) Tcw_frame * inv(Tcw_refkf) at record time
    ref_kf: int               # KF slot (-1: absolute, pre-map)
    is_keyframe: bool
    state: int
    ref_frame_id: int = -1    # source frame id of the reference KF — the slot
                              # alone is ambiguous once slots recycle; export
                              # verifies identity and falls back to the pose the
                              # KF had when it was culled


class SlamSystem:
    """``System::TrackMonocularWithOdom`` equivalent front door."""

    def __init__(self, cfg: SystemConfig = SystemConfig(), localization_only: bool = False,
                 async_mapping: bool = False):
        self.cfg = cfg
        self.map: Optional[ms.MapState] = None
        self.state = tr.NOT_INITIALIZED
        self.localization_only = localization_only  # ActivateLocalizationMode analog
        self.ref_frame: Optional[Frame] = None
        self.ref_frame_id: int = -1
        self.last_frame: Optional[Frame] = None
        self._pending_last_frame: Optional[Frame] = None  # truncated init frame
        self.last_assoc: Optional[tr.TrackObs] = None
        self.last_Tcw = se3.identity()
        self.last_kf_slot = -1
        self.last_kf_frame_id = -1
        self.ref_kf_tracked = 0
        self.frame_id = -1
        self.n_lost_frames = 0
        self._reloc_frame_id = -10000  # last reloc/re-init frame (gate relaxation)
        self.trajectory: List[TrajectoryEntry] = []
        self._odom_history = {}  # frame trajectory index -> odom (pre-init backfill)
        self._kf_alive = {}       # frame_id -> last seen pose of live KFs
        self._dead_kf_poses = {}  # frame_id -> pose at cull time (recycled slots)
        self.frame_times: List[float] = []  # per-frame wall time (CalExTime analog)
        self.tracer = Tracer()              # per-stage spans (SURVEY.md §5 tracing)
        self.loop_closer = lc.LoopCloser(cfg)
        self.loop_closer.tracer = self.tracer
        self.enable_loop_closing = True
        self.n_loops_closed = 0
        # (Tcw, odom) of the last pose before a reset: the next init chains its
        # world gauge onto the dead-reckoned continuation of this pose so the
        # exported trajectory stays in ONE world frame across resets
        self._reset_anchor = None
        self._velocity = se3.identity()  # mVelocity (constant-velocity model)
        self._key = jax.random.PRNGKey(7)
        # --- async mapping (the reference's LocalMapping thread, System.cc:97-98)
        # Mapping work runs in a native pipeline stage on a map SNAPSHOT while
        # tracking continues on the previous map; the result is merged at the
        # next frame boundary.  Tracking-side found/visible counter updates made
        # while a job is in flight are dropped (advisory counters only).
        self.async_mapping = async_mapping
        self._pending_result = None     # finished mapping output awaiting merge
        self._mapping_busy = False
        self._kf_journal = []  # KFs inserted while a loop correction ran
        self._job_bp_valid = None   # bp_valid snapshot the in-flight job sees
        self._job_bp_gen = None     # bp_gen at snapshot (slot identity)
        self._journal_created_bp = None  # bird slots journal inserts created
        self.n_bird_replay_dropped = 0   # frame-born birds lost to slot famine
        self.n_journal_kfs_dropped = 0   # journaled KFs lost to slot famine
        self.n_forced_kf_evictions = 0   # force_evict_keyframe fires (valves)
        self._pipeline = None
        if async_mapping:
            from fishbirdeyevisualslam_tpu.runtime.native import AsyncPipeline
            self._mapping_jobs = {}
            self._pipeline = AsyncPipeline([self._mapping_stage], capacity=2)

    def _mapping_stage(self, stage: int, item: int):
        """Runs in the pipeline worker thread: triangulate + fuse + cull +
        local BA + (optionally) loop closing on a snapshot.

        The InterruptBA abort flag is honored at the pre/BA boundary — map
        maintenance always lands, but a pending keyframe can skip the local BA
        + KF-cull tail (the reference's ``mbAbortBA`` check before BA,
        ``LocalMapping.cc:85-97``)."""
        m, new_slot, prev_slot, frame_id = self._mapping_jobs.pop(item)
        cfg = self.cfg
        m = tr.local_mapping_pre(m, jnp.int32(new_slot), cfg,
                                 cfg.tracking.mapping_neighbors)
        jax.block_until_ready(m.kf_Tcw)
        aborted = self._pipeline is not None and self._pipeline.abort_requested(0)
        if not aborted:
            m = tr.local_mapping_ba(m, jnp.int32(new_slot), cfg)
        closed = False
        if self.enable_loop_closing and not aborted:
            m, closed = self.loop_closer.process_keyframe(m, new_slot)
        jax.block_until_ready(m.kf_Tcw)
        self._pending_result = (m, new_slot, closed)
        self._mapping_busy = False

    # ------------------------------------------------------------------ utils
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _odom_T21(self, f1: Frame, f2: Frame):
        """T_c2_c1 from odometry (the initializer's scale/seed input)."""
        return se3.inverse(odo.preintegrate_cam(self.cfg.extrinsics, f1.odom, f2.odom))

    def _record(self, f: Frame, Tcw, is_kf: bool):
        ref = self.last_kf_slot
        if ref >= 0 and self.map is not None:
            T_rel = se3.compose(jnp.asarray(Tcw), se3.inverse(self.map.kf_Tcw[ref]))
        else:
            T_rel = jnp.asarray(Tcw)
        self._odom_history[len(self.trajectory)] = np.asarray(f.odom)
        self.trajectory.append(
            TrajectoryEntry(float(f.timestamp), np.asarray(T_rel), ref, is_kf,
                            self.state, self.last_kf_frame_id)
        )

    def _refresh_kf_snapshot(self):
        """Track live keyframes by FRAME ID and remember the final pose of any
        keyframe that KeyFrameCulling retired, so trajectory entries anchored to
        it stay meaningful after its slot is recycled (the reference chains
        culled KFs to their spanning-tree parent at export, ``System.cc:384-470``;
        freezing at the cull-time estimate is the functional-state analog)."""
        if self.map is None:
            return
        m = self.map
        valid = np.asarray(m.kf_valid)
        fids = np.asarray(m.kf_frame_id)
        poses = np.asarray(m.kf_Tcw)
        new = {int(fids[k]): poses[k] for k in np.nonzero(valid)[0]}
        for fid, pose in self._kf_alive.items():
            if fid not in new:
                self._dead_kf_poses[fid] = pose
        self._kf_alive = new

    def _entry_Tcw(self, e: TrajectoryEntry, fid_to_slot, kf_Tcw) -> np.ndarray:
        """Absolute Tcw of a trajectory entry under the CURRENT map (loop/BA
        corrections propagate through the reference KF), falling back to the
        cull-time pose if the reference KF no longer exists."""
        if e.ref_kf >= 0:
            slot = fid_to_slot.get(e.ref_frame_id)
            if slot is not None and kf_Tcw is not None:
                return np.asarray(se3.compose(jnp.asarray(e.T_rel),
                                              jnp.asarray(kf_Tcw[slot])))
            dead = self._dead_kf_poses.get(e.ref_frame_id)
            if dead is not None:
                return np.asarray(se3.compose(jnp.asarray(e.T_rel),
                                              jnp.asarray(dead)))
        return np.asarray(e.T_rel)

    def _fid_to_slot(self):
        if self.map is None:
            return {}
        valid = np.asarray(self.map.kf_valid)
        fids = np.asarray(self.map.kf_frame_id)
        return {int(fids[k]): int(k) for k in np.nonzero(valid)[0]}

    def _consume_pending(self):
        """Merge a finished async mapping/loop-correction result and REPLAY any
        keyframes tracking inserted meanwhile (the reference's spanning-tree
        propagation of concurrently created KFs after a background GBA,
        ``LoopClosing.cc:674-841``).  Each journaled KF re-enters the corrected
        map at ``T_rel_to_ref * Tcw_ref_corrected`` — its relative pose to its
        reference KF at insertion time, composed onto that reference's
        corrected pose."""
        if self._pending_result is None:
            return
        m, kf_slot, closed = self._pending_result
        self._pending_result = None
        remap = None
        live = self.map
        if (live is not None and self.cfg.flags.have_bird
                and self._job_bp_valid is not None):
            # replay frame-born bird points created by tracking since the
            # snapshot (VERDICT r3 weak #3: async mode silently lost the
            # per-frame bird constraints right after every keyframe).  Bird
            # points journal inserts created are excluded — their keyframes
            # re-create them during journal replay below.
            # a slot is BORN if it was free at snapshot OR its generation
            # changed since (freed by the live per-frame cull, then recycled
            # by bird_frame_maintenance — bp_valid alone aliases the new
            # landmark with the one the worker kept, ADVICE r4 medium)
            born = live.bp_valid & (
                ~self._job_bp_valid | (live.bp_gen != self._job_bp_gen))
            if self._journal_created_bp is not None:
                born = born & ~(self._journal_created_bp == live.bp_gen)
            m, remap, n_drop = tr.replay_bird_points(m, live, born)
            self.n_bird_replay_dropped += int(n_drop)
        self._job_bp_valid = None
        self._job_bp_gen = None
        self._journal_created_bp = None
        self.map = m
        if closed:
            self.n_loops_closed += 1
        if self._kf_journal:
            cfg = self.cfg
            last_slot = None
            PB = self.map.bp_pos.shape[0]
            for e in self._kf_journal:
                fid_to_slot = self._fid_to_slot()
                ref_slot = fid_to_slot.get(e["ref_fid"])
                T_rel = se3.compose(jnp.asarray(e["Tcw"]),
                                    se3.inverse(jnp.asarray(e["T_ref_live"])))
                if ref_slot is not None:
                    Tcw_corr = se3.compose(T_rel, self.map.kf_Tcw[ref_slot])
                elif e["ref_fid"] in self._dead_kf_poses:
                    Tcw_corr = se3.compose(
                        T_rel, jnp.asarray(self._dead_kf_poses[e["ref_fid"]]))
                else:
                    Tcw_corr = jnp.asarray(e["Tcw"])
                slot_j, slot_ok, _ = tr.free_kf_slot(self.map)
                if not bool(slot_ok):
                    # slot-starved at merge: try the pressure valve before
                    # dropping a journaled KF (VERDICT r3 weak #8)
                    self.map = tr.force_evict_keyframe(self.map, cfg)
                    self.n_forced_kf_evictions += 1
                    self._refresh_kf_snapshot()
                    slot_j, slot_ok, _ = tr.free_kf_slot(self.map)
                if not bool(slot_ok):
                    self.n_journal_kfs_dropped += 1
                    continue
                assoc = e["assoc"]
                if remap is not None:
                    # bird ids recorded against the live map: route through the
                    # replay remap (worker-culled / lost points become -1)
                    bp = assoc.bp_idx
                    assoc = tr.TrackObs(
                        assoc.mp_idx,
                        jnp.where(bp >= 0, remap[jnp.clip(bp, 0, PB - 1)], -1))
                self.map = tr.insert_keyframe(
                    self.map, e["f"], assoc, Tcw_corr, cfg,
                    jnp.int32(e["frame_id"]), slot=slot_j)
                last_slot = int(slot_j)
                last_fid = e["frame_id"]
            if last_slot is not None:
                self.last_kf_slot = last_slot
                self.last_kf_frame_id = last_fid
                self.last_assoc = tr.TrackObs(self.map.kf_mp[last_slot],
                                              self.map.kf_bird_mp[last_slot])
            self._kf_journal = []
        self._refresh_kf_snapshot()
        if self.last_assoc is not None:
            # bird ids held by tracking reference the PRE-merge map: route
            # through the replay remap (identity for surviving points,
            # reallocated slot for frame-born ones, -1 for lost ones)
            bp = self.last_assoc.bp_idx
            if remap is not None:
                PB = remap.shape[0]
                bp = jnp.where(bp >= 0, remap[jnp.clip(bp, 0, PB - 1)], -1)
            else:
                bp = jnp.full_like(bp, -1)
            self.last_assoc = tr.TrackObs(self.last_assoc.mp_idx, bp)

    # ------------------------------------------------------------------ API
    def track(self, front_gray, bird_gray, bird_mask, odom, timestamp,
              contour=None) -> np.ndarray:
        """Process one frame; returns the current Tcw estimate (7,).

        ``contour``: optional bird-view contour label image (edge pixels < 150,
        the dataset's ``birdviewContourICP``); when given, bird keypoints are
        restricted to the contour neighborhood like the reference Frame ctor
        (``GuidenceKeyBirdPts``, ``Frame.cc:671-739``)."""
        import time as _time
        _t0 = _time.perf_counter()
        self.frame_id += 1
        # the reference doubles the FRONT extraction budget while uninitialized
        # (init ORBextractor with 2x features, Tracking.cc:127-133); the init
        # pair is truncated back to capacity at map creation
        cap = self.cfg.capacity
        n_front = (max(self.cfg.orb.n_features_init, cap.max_front_kp)
                   if self.state == tr.NOT_INITIALIZED else cap.max_front_kp)
        with self.tracer.span("frame_build"):
            f = build_frame(
                jnp.asarray(front_gray, jnp.float32),
                jnp.asarray(bird_gray, jnp.float32),
                jnp.asarray(bird_mask),
                jnp.asarray(odom, jnp.float32),
                jnp.asarray(timestamp, jnp.float32),
                self.cfg,
                n_front,
                None if contour is None else jnp.asarray(contour, jnp.float32),
                cap.max_bird_kp,
            )
        # merge a finished async mapping result at the frame boundary
        self._consume_pending()
        if self.state == tr.NOT_INITIALIZED:
            with self.tracer.span("initialize"):
                Tcw = self._initialize(f)
        elif self.state == tr.OK:
            with self.tracer.span("track"):
                Tcw = self._track_ok(f)
        else:
            with self.tracer.span("track_lost"):
                Tcw = self._track_lost(f)
        if self.last_frame is not None:
            # mVelocity = Tcw_cur * Twc_last (Tracking.cc:683-694)
            self._velocity = se3.compose(
                jnp.asarray(Tcw), se3.inverse(jnp.asarray(self.last_Tcw)))
        # after a successful two-view init the frame in hand carries the
        # DOUBLED init extraction budget; the truncated (capacity-shaped)
        # variant must become last_frame or the next frame's programs — and a
        # LOST -> re-init writing last_frame into a KF slot — see mismatched
        # shapes (crash found by the r5 LOST-valve test)
        self.last_frame = (f if self._pending_last_frame is None
                           else self._pending_last_frame)
        self._pending_last_frame = None
        self.last_Tcw = Tcw
        self.frame_times.append(_time.perf_counter() - _t0)
        return np.asarray(Tcw)

    # ---------------------------------------------------------------- states
    def _initialize(self, f: Frame):
        cfg = self.cfg
        if self.ref_frame is None:
            self.ref_frame = f
            self.ref_frame_id = self.frame_id
            self._record(f, se3.identity(), False)
            return se3.identity()
        res = tr.match_for_init(self.ref_frame, f, cfg)
        n = int(res.count)
        T21_odom = self._odom_T21(self.ref_frame, f)
        bird_ok = cfg.flags.have_bird and cfg.tracking.min_bird_init_matches > 0
        init_out = None
        if n < cfg.tracking.min_init_matches:
            # not enough front matches (Tracking.cc:854-861).  Before restarting
            # the pair, try the bird-seeded bootstrap — texture-poor FRONT
            # imagery says nothing about the bird view
            if bird_ok:
                init_out, _ = tr.bird_seeded_init(self.ref_frame, f, cfg, res, T21_odom)
            if init_out is None or not bool(init_out.success):
                self.ref_frame = f
                self.ref_frame_id = self.frame_id
                self._record(f, se3.identity(), False)
                return se3.identity()
        if init_out is None:
            P = f.uv.shape[0]
            uv2 = jnp.where(res.ok[:, None], f.uv[jnp.clip(res.idx, 0, P - 1)], 0.0)
            init_out = tr.init_mod.initialize(
                cfg.camera, self.ref_frame.uv, uv2, res.ok, T21_odom, self._next_key(),
                loose_couple=cfg.flags.loose_couple,
            )
            if not bool(init_out.success) and cfg.flags.loose_couple:
                # planar/degenerate-F scenes: fall back to the odometry-rotation
                # hypothesis (the ReInitconstructF path) instead of the H model
                init_out = tr.init_mod.reinitialize(
                    cfg.camera, self.ref_frame.uv, uv2, res.ok, T21_odom, self._next_key(),
                )
            if not bool(init_out.success) and bird_ok:
                # front epipolar geometry failed both ways: bird-seeded bootstrap
                init_out, _ = tr.bird_seeded_init(self.ref_frame, f, cfg, res, T21_odom)
        if not bool(init_out.success):
            self._record(f, se3.identity(), False)
            return se3.identity()
        f1m, f2m = self.ref_frame, f
        if f.uv.shape[0] != cfg.capacity.max_front_kp:
            # init frames carry the doubled budget: truncate to KF capacity,
            # matched features first (Tracking.cc:127-133 analog)
            f1m, f2m, res, init_out = tr.truncate_init_frames(
                f1m, f2m, res, init_out, cfg.capacity.max_front_kp)
            # the capacity-shaped frame must also serve as last_frame for the
            # NEXT frame's programs (see track()'s _pending_last_frame note)
            self._pending_last_frame = f2m
        m = tr.create_initial_map(
            f1m, f2m, init_out, cfg, res,
            jnp.asarray([self.ref_frame_id, self.frame_id], jnp.int32),
        )
        # initial global BA (GlobalBundleAdjustemntWithOdom(map, 20), Tracking.cc:994)
        m = tr.local_ba(m, cfg, jnp.int32(1))
        # normals/descriptors/scale ranges for the fresh map (the reference's
        # MapPoint ctor computes these immediately; without them the frustum
        # and octave gates would starve TrackLocalMap right after init)
        m = tr.update_point_stats(m, cfg)
        if self._reset_anchor is not None:
            # chain this submap's gauge onto the dead-reckoned continuation of
            # the pre-reset pose (odometry is an absolute SE2 stream, so the
            # motion prior bridges the uninitialized gap exactly)
            aT, aodom = self._reset_anchor
            self._reset_anchor = None
            Tcw1 = odo.motion_prior_Tcw(
                cfg.extrinsics, jnp.asarray(aT), jnp.asarray(aodom),
                self.ref_frame.odom)
            m = tr.apply_world_gauge(m, Tcw1)
        self.map = m
        self.state = tr.OK
        self._reloc_frame_id = self.frame_id
        self.last_kf_slot = 1
        self.last_kf_frame_id = self.frame_id
        self.last_assoc = tr.TrackObs(m.kf_mp[1], m.kf_bird_mp[1])
        # backfill the pre-init trajectory by odometry dead-reckoning relative to
        # the first KF (those frames were recorded at identity; the vehicle may
        # have moved meters before two-view init succeeded)
        ref_odom = self.ref_frame.odom
        for idx, e in enumerate(self.trajectory):
            if e.ref_kf == -1:  # -2 = frozen absolute from a pre-reset epoch
                frame_odom = self._odom_history.get(idx)
                if frame_odom is None:
                    continue
                Tcw_i = odo.motion_prior_Tcw(
                    cfg.extrinsics, m.kf_Tcw[0], ref_odom, jnp.asarray(frame_odom))
                e.T_rel = np.asarray(se3.compose(Tcw_i, se3.inverse(m.kf_Tcw[0])))
                e.ref_kf = 0
                e.ref_frame_id = self.ref_frame_id
        self.ref_kf_tracked = int(jnp.sum((m.kf_mp[1] >= 0)))
        Tcw = m.kf_Tcw[1]
        self._record(f, Tcw, True)
        return Tcw

    def _motion_prior(self, f: Frame):
        """Pose prediction for the new frame: odometry delta when
        ``loose_couple`` (``Tracking.cc:1316-1320``), otherwise the reference's
        constant-velocity model ``mVelocity * lastTcw`` (``Tracking.cc:1330``)."""
        if self.cfg.flags.loose_couple:
            return odo.motion_prior_Tcw(
                self.cfg.extrinsics, self.last_Tcw, self.last_frame.odom, f.odom)
        return se3.compose(self._velocity, jnp.asarray(self.last_Tcw))

    def _track_ok(self, f: Frame):
        cfg = self.cfg
        m = self.map
        Tcw_pred = self._motion_prior(f)
        # --- the fused frame step: motion-model match (15/30 px widening on
        # device) + bird match + pose opt + TrackLocalMap + second pose opt +
        # found/visible counters, ONE device program, ONE scalar fetch
        # (VERDICT round-1 weak #2: ~15 blocking reads/frame before)
        # candidate ID LIST: last frame's associations + reference KF points
        # (r5 — the scatter-built (P,) bool mask forced two O(P) compaction
        # passes per frame inside the core; the id list needs none)
        cand_last = jnp.concatenate(
            [self.last_assoc.mp_idx, m.kf_mp[self.last_kf_slot]])
        # per-frame bird maintenance stays ON while an async mapping job is in
        # flight: points born into the live copy are journaled (diffed against
        # the job's bp_valid snapshot) and replayed into the worker's result at
        # merge — see _consume_pending / tr.replay_bird_points
        maint_ok = True
        core = tr.track_frame_core(
            m, f, cfg, Tcw_pred, cand_last,
            jnp.int32(max(self.last_kf_slot, 0)),
            last_f=tr.bird_only_view(self.last_frame),
            last_bp_idx=self.last_assoc.bp_idx,
            last_Tcw=jnp.asarray(self.last_Tcw),
            bird_maint_enabled=jnp.asarray(maint_ok))
        (n_mm, n_in, nref3, nref2, n_bird_cur, n_ref_bird,
         n_kfs) = (int(x) for x in np.asarray(core.scalars))
        Tcw = core.Tcw
        assoc = tr.TrackObs(core.mp_idx, core.bp_idx)
        if n_mm < 10:
            # rare TrackReferenceKeyFrame fallback (Tracking.cc:1180-1244):
            # BoW-gated match against the reference KF, then redo the local-map
            # step seeded from its pose
            words = bow_ops.word_ids(f.desc_pm1)
            Tcw_r, mp_idx_r, n_r, ok_r = lc.relocalize_against(
                m, f.desc_pm1, words, cfg, f.uv, f.kp_valid,
                jnp.int32(self.last_kf_slot), self._next_key())
            if int(n_r) > n_mm and bool(ok_r):
                out1 = tr.pose_opt_step(
                    m, f, tr.TrackObs(mp_idx_r, jnp.full_like(assoc.bp_idx, -1)),
                    cfg, Tcw_r, Tcw_pred)
                pt_local, _ = tr.local_map_mask(m, mp_idx_r, cfg)
                res2, vis2 = tr.match_map_points(
                    m, f, cfg, out1.Tcw, pt_local,
                    radius=jnp.float32(12.0),
                    max_dist=jnp.float32(cfg.matcher.th_high),
                    frustum_gates=True)
                mp_idx = jnp.where(mp_idx_r >= 0, mp_idx_r, res2.idx)
                bres2 = tr.match_bird_points(
                    m, f, cfg, out1.Tcw, tr.bird_local_mask(m, cfg, out1.Tcw))
                out2 = tr.pose_opt_step(
                    m, f, tr.TrackObs(mp_idx, bres2.idx), cfg, out1.Tcw, Tcw_pred)
                n_in = int(out2.n_inliers)
                Tcw = out2.Tcw
                assoc = tr.TrackObs(
                    jnp.where(out2.front_inlier, mp_idx, -1),
                    jnp.where(out2.bird_inlier, bres2.idx, -1))
        self.map = m = core.map

        # TrackLocalMap success gate (the reference demands >= 30 inliers,
        # ``Tracking.cc:1429-1441``; relaxed for 2*fps frames after a
        # relocalization/re-init, mirroring the mnLastRelocFrameId window)
        recent_reloc = self.frame_id - self._reloc_frame_id < 2 * cfg.camera.fps
        min_ok = 10 if recent_reloc else cfg.tracking.min_inliers_ok
        if n_in < min_ok:
            if self._pipeline is not None and (
                    self._mapping_busy or self._pending_result is not None):
                # Tracking starved while a mapping job was in flight: the live
                # map is the stale pre-BA snapshot.  Drain the pipeline, merge
                # the refined map, and retry the frame before declaring loss —
                # the reference's Tracking holds mMutexMapUpdate for the whole
                # frame (Tracking.cc:489) so it never races LocalMapping's
                # writeback like this.
                self._pipeline.flush()
                self._consume_pending()
                return self._track_ok(f)
            if int(self.map.kf_counter) <= 5 and not self.localization_only:
                # lost with a barely-born map: full reset, like the reference's
                # Track() (Tracking.cc:731-740) — re-initialization has nothing
                # worth preserving yet
                self.reset()
                self._record(f, Tcw, False)
                return Tcw
            self.state = tr.LOST
            self.n_lost_frames = 0
            self._record(f, Tcw, False)
            self.last_assoc = assoc
            return Tcw

        self.last_assoc = assoc
        # --- keyframe policy (NeedNewKeyFrame, Tracking.cc:1444-1540): full
        # c1a/c1b/c2 decision on the reference's terms — nRefMatches counts the
        # reference KF's points with >= minObs observations (minObs 3, or 2 for
        # a 2-KF map), mapping idleness feeds c1b, and a needed-but-busy
        # insertion requests InterruptBA instead of inserting (mono semantics)
        n_ref_matches = nref3 if n_kfs > 2 else nref2
        mapping_idle = not self._mapping_busy
        need, interrupt = tr.need_new_keyframe(
            cfg, localization_only=self.localization_only, n_kfs=n_kfs,
            frame_id=self.frame_id, last_kf_frame_id=self.last_kf_frame_id,
            last_reloc_frame_id=self._reloc_frame_id, n_inliers=n_in,
            n_ref_matches=n_ref_matches, mapping_idle=mapping_idle,
            n_bird_matched=n_bird_cur, n_ref_bird=n_ref_bird)
        is_kf = False
        if interrupt and self._pipeline is not None:
            if self.loop_closer.correcting:
                # a background loop correction is in flight — it cannot be
                # aborted, and refusing keyframes for its whole duration would
                # stall the map.  Insert into the LIVE map and JOURNAL the
                # keyframe; _consume_pending replays it through the correction
                # at merge (the reference's concurrent-insertion handling in
                # RunGlobalBundleAdjustment, ``LoopClosing.cc:674-841``).
                slot_j, slot_ok, _ = tr.free_kf_slot(m)
                if bool(slot_ok) and self.last_kf_slot >= 0:
                    ref_slot = self.last_kf_slot
                    T_ref_live = np.asarray(m.kf_Tcw[ref_slot])
                    m2 = tr.insert_keyframe(m, f, assoc, Tcw, cfg,
                                            jnp.int32(self.frame_id), slot=slot_j)
                    # bird slots this insert created are re-created by journal
                    # replay — exclude them from the frame-born replay diff.
                    # Stored as the slot GENERATION at creation (-1 elsewhere)
                    # so a slot later freed and recycled by frame maintenance
                    # is no longer excluded (its gen moved on)
                    created = m2.bp_valid & ~m.bp_valid
                    created_gen = jnp.where(created, m2.bp_gen, -1)
                    self._journal_created_bp = created_gen if (
                        self._journal_created_bp is None
                    ) else jnp.maximum(self._journal_created_bp, created_gen)
                    self.map = m2
                    self._kf_journal.append(dict(
                        f=f, assoc=assoc, Tcw=np.asarray(Tcw),
                        frame_id=self.frame_id,
                        ref_fid=self.last_kf_frame_id, T_ref_live=T_ref_live))
                    self.last_kf_slot = int(slot_j)
                    self.last_kf_frame_id = self.frame_id
                    self.ref_kf_tracked = n_in
                    self.last_assoc = tr.TrackObs(m2.kf_mp[int(slot_j)],
                                                  m2.kf_bird_mp[int(slot_j)])
                    self._record(f, Tcw, True)
                    return Tcw
            else:
                # abort the in-flight local BA so the worker frees the pipeline
                # for the pending keyframe (LocalMapping::InterruptBA analog)
                self._pipeline.signal_abort(0)
        if need and not self._mapping_busy:
            m = self.map
            slot_j, slot_ok, _ = tr.free_kf_slot(m)
            if not bool(slot_ok):
                # every slot live and redundancy culling found nothing: evict
                # the least-connected eligible KF (sliding-window pressure
                # valve) so insertion NEVER dies at capacity
                m = tr.force_evict_keyframe(m, cfg)
                self.n_forced_kf_evictions += 1
                self.map = m
                self._refresh_kf_snapshot()
                slot_j, slot_ok, _ = tr.free_kf_slot(m)
            if not bool(slot_ok):
                need = False  # nothing evictable (tiny map of protected KFs)
        if need and not self._mapping_busy:
            new_slot = int(slot_j)
            m = tr.insert_keyframe(m, f, assoc, Tcw, cfg, jnp.int32(self.frame_id),
                                   slot=slot_j)
            if self.async_mapping:
                # hand the snapshot to the mapping stage; tracking continues on
                # the inserted-but-unrefined map (the reference's behavior while
                # LocalMapping churns)
                self.map = m
                self._mapping_busy = True
                self._job_bp_valid = m.bp_valid  # replay diff base (immutable)
                self._job_bp_gen = m.bp_gen      # slot identity at snapshot
                job_id = self.frame_id
                self._mapping_jobs[job_id] = (m, new_slot, self.last_kf_slot, self.frame_id)
                self._pipeline.submit(job_id)
            else:
                # one fused device program for the whole mapping iteration
                # (triangulate/fuse/cull/stats/BA/KF-cull): one dispatch, not 7
                m = tr.local_mapping_step(m, jnp.int32(new_slot), cfg,
                                          cfg.tracking.mapping_neighbors)
                if self.enable_loop_closing:
                    m, closed = self.loop_closer.process_keyframe(m, new_slot)
                    if closed:
                        self.n_loops_closed += 1
                self.map = m
                Tcw = m.kf_Tcw[new_slot]
                self._refresh_kf_snapshot()  # mapping may have culled a KF
            self.last_kf_slot = new_slot
            self.last_kf_frame_id = self.frame_id
            self.ref_kf_tracked = n_in
            # refresh associations from the KF record (post-BA in sync mode)
            self.last_assoc = tr.TrackObs(self.map.kf_mp[new_slot],
                                          self.map.kf_bird_mp[new_slot])
            is_kf = True
        self._record(f, Tcw, is_kf)
        return Tcw

    def _track_lost(self, f: Frame):
        """Loss recovery: odometry dead-reckoning + bird-only tracking + odometry-
        seeded re-initialization of a fresh KF pair (Tracking.cc:2395-2481)."""
        cfg = self.cfg
        if self._pipeline is not None:
            # the LOST path appends KFs; an in-flight (or just-finished) mapping
            # snapshot merged afterwards would overwrite the new submap — drain
            # the pipeline and consume the result NOW (the reference's
            # RequestStop/isStopped handshake, LocalMapping.cc:579-654)
            if self._mapping_busy:
                self._pipeline.flush()
            self._consume_pending()
        m = self.map
        Tcw_pred = self._motion_prior(f)
        self.n_lost_frames += 1
        # TrackUsingBird (Tracking.cc:2014-2061): bird-only pose refinement
        # against the bird local map.  Like the reference, the state stays LOST
        # (Track() never sets bOK from it) — the bird pose only carries the
        # frame estimate while re-init converges.
        Tcw = Tcw_pred
        if cfg.flags.have_bird:
            bres = tr.match_bird_points(
                m, f, cfg, Tcw_pred, tr.bird_local_mask(m, cfg, Tcw_pred))
            n_bird_avail = int(jnp.sum(tr.bird_local_mask(m, cfg, Tcw_pred)))
        else:
            bres = tr.matcher.MatchResult(
                jnp.full_like(self.last_assoc.bp_idx, -1),
                jnp.full_like(self.last_assoc.bp_idx, tr.matcher.BIG, jnp.float32),
                jnp.zeros_like(self.last_assoc.bp_idx, bool))
            n_bird_avail = 0
        n_bird_matched = 0
        if int(bres.count) >= 10:
            bird_assoc = tr.TrackObs(jnp.full_like(self.last_assoc.mp_idx, -1), bres.idx)
            outb = tr.pose_opt_step(m, f, bird_assoc, cfg, Tcw_pred)
            n_bird_matched = int(outb.bird_inlier.sum())
            if n_bird_matched >= 10:
                Tcw = outb.Tcw
        # slot-starved recovery (soak r4: a map wedged at capacity-2 while
        # LOST blocks re-init FOREVER — its n_free > 2 gate can never pass):
        # evict least-connected keyframes until recovery has headroom
        if (not self.localization_only
                and cfg.tracking.lost_eviction_valve
                and int(jnp.sum(~m.kf_valid)) <= 2
                and int(jnp.sum(m.kf_valid)) > 10):
            for _ in range(4):
                m = tr.force_evict_keyframe(m, cfg)
                self.n_forced_kf_evictions += 1
            self.map = m
            self._refresh_kf_snapshot()
        # BirdNeedKF (Tracking.cc:2063-2083): when matches cover <70% of the
        # local bird map (or are nearly gone while points exist), extend the
        # bird map with a keyframe from this frame — CreateNewKeyFrame is
        # called even while LOST (Track(), :558-559).  Gated on n_kf > 5: in the
        # reference, a LOST state with <=5 KFs resets the map before this branch
        # can ever run (Tracking.cc:731-740), so bird KFs only extend mature
        # maps — without the gate a dead-reckoned KF lands in a barely-born map
        # and poisons re-initialization.
        slot_j, slot_ok, n_free = tr.free_kf_slot(m)
        if (not self.localization_only
                and int(jnp.sum(m.kf_valid)) > 5
                and int(n_free) > 2
                and self.frame_id - self.last_kf_frame_id > 2
                and (n_bird_matched < 0.7 * n_bird_avail
                     or (n_bird_matched < 10 and n_bird_avail > 10))
                and int(jnp.sum(f.bird_kp_valid)) >= 20):
            assoc = tr.TrackObs(jnp.full_like(self.last_assoc.mp_idx, -1),
                                jnp.where(bres.idx >= 0, bres.idx, -1))
            slot = int(slot_j)
            m = tr.insert_keyframe(m, f, assoc, Tcw, cfg, jnp.int32(self.frame_id),
                                   slot=slot_j)
            self.map = m
            self.last_kf_slot = slot
            self.last_kf_frame_id = self.frame_id

        # relocalization: BoW candidates + PnP, round-robining the TOP
        # candidates like the reference's per-candidate P4P RANSAC loop
        # (``Tracking.cc:2231-2392``; round 1 tried only the single best)
        if int(jnp.sum(m.kf_valid)) >= 2:
            words = bow_ops.word_ids(f.desc_pm1)
            # covisibility-group accumulated retrieval: candidates are the best
            # members of the top-scoring groups, 75% retain rule applied on
            # device (``KeyFrameDatabase.cc:199-310``)
            members, accs = lc.relocalize_group_candidates(m, words, cfg, f.kp_valid)
            members, accs = np.asarray(members), np.asarray(accs)
            tried = set()
            for cand, acc in zip(members, accs):
                cand = int(cand)
                if acc <= 0.05 or cand in tried:
                    continue
                tried.add(cand)
                Tcw_r, mp_idx, n_in, ok = lc.relocalize_against(
                    m, f.desc_pm1, words, cfg, f.uv, f.kp_valid,
                    jnp.int32(cand), self._next_key())
                if not bool(ok):
                    continue
                assoc = tr.TrackObs(mp_idx, jnp.full_like(self.last_assoc.bp_idx, -1))
                out = tr.pose_opt_step(m, f, assoc, cfg, Tcw_r)
                if int(out.n_inliers) >= 15:
                    self.state = tr.OK
                    self._reloc_frame_id = self.frame_id
                    self.last_assoc = tr.TrackObs(
                        jnp.where(out.front_inlier, assoc.mp_idx, -1),
                        jnp.full_like(self.last_assoc.bp_idx, -1))
                    self._record(f, out.Tcw, False)
                    return out.Tcw

        # attempt odometry-seeded re-initialization against the previous frame
        res = tr.match_for_init(self.last_frame, f, cfg)
        if int(res.count) >= cfg.tracking.min_init_matches and int(n_free) > 2:
            T21_odom = self._odom_T21(self.last_frame, f)
            P = cfg.capacity.max_front_kp
            uv2 = jnp.where(res.ok[:, None], f.uv[jnp.clip(res.idx, 0, P - 1)], 0.0)
            out = tr.init_mod.reinitialize(
                cfg.camera, self.last_frame.uv, uv2, res.ok, T21_odom, self._next_key(),
            )
            if not bool(out.success) and cfg.flags.have_bird \
                    and cfg.tracking.min_bird_init_matches > 0:
                # bird-seeded re-init: at small inter-frame baselines the
                # odometry-R epipolar re-init has no parallax (soak r4: 600
                # straight frames of failed ReInit at 0.25 m steps) — the bird
                # keypoints carry exact metric 3D regardless of baseline, the
                # same bridge bird_seeded_init provides at bootstrap
                out, _ = tr.bird_seeded_init(self.last_frame, f, cfg, res,
                                             T21_odom)
            if bool(out.success):
                m, slot = self._append_reinit_pair(m, self.last_frame, f, out, res)
                self.map = m
                self.state = tr.OK
                self._reloc_frame_id = self.frame_id
                Tcw = m.kf_Tcw[slot]
                self.last_kf_slot = slot
                self.last_kf_frame_id = self.frame_id
                self.last_assoc = tr.TrackObs(m.kf_mp[slot], m.kf_bird_mp[slot])
                self.ref_kf_tracked = int(jnp.sum(m.kf_mp[slot] >= 0))
                self._record(f, Tcw, True)
                return Tcw
        self._record(f, Tcw, False)
        self.last_assoc = tr.TrackObs(
            jnp.full_like(self.last_assoc.mp_idx, -1),
            jnp.full_like(self.last_assoc.bp_idx, -1),
        )
        return Tcw

    def _append_reinit_pair(self, m, f1, f2, init_out, match_res):
        """``CreateReInitialMapPoints`` (``Tracking.cc:1056-1159``): append a KF
        pair starting a new sub-map, with poses chained from the last estimate."""
        cfg = self.cfg
        Tcw1 = self.last_Tcw  # pose of f1 = dead-reckoned last pose
        Tcw2 = se3.compose(init_out.T21, Tcw1)
        slot1, ok1, _ = tr.free_kf_slot(m)
        m = tr._write_kf(m, slot1, f1, Tcw1, True, jnp.int32(self.frame_id - 1))
        slot2, ok2, _ = tr.free_kf_slot(m)
        m = tr._write_kf(m, slot2, f2, Tcw2, False, jnp.int32(self.frame_id))
        # triangulated points are in f1's camera frame -> world
        Twc1 = se3.inverse(Tcw1)
        Xw = se3.transform(Twc1, init_out.Xw)
        F = f1.uv.shape[0]
        P = m.mp_pos.shape[0]
        ok = match_res.ok & init_out.triangulated
        dest, can = ms.alloc_slots(m.mp_valid, ok)
        m = ms.reset_point_slots(m, dest, can, m.kf_seq[slot1])
        feat2 = jnp.clip(match_res.idx, 0, F - 1)
        m = m._replace(
            mp_pos=m.mp_pos.at[dest].set(jnp.where(can[:, None], Xw, m.mp_pos[dest])),
            mp_desc=m.mp_desc.at[dest].set(jnp.where(can[:, None], f2.desc[feat2], m.mp_desc[dest])),
            mp_desc_pm1=m.mp_desc_pm1.at[dest].set(jnp.where(
                can[:, None], f2.desc_pm1[feat2].astype(jnp.bfloat16), m.mp_desc_pm1[dest])),
            mp_valid=m.mp_valid.at[dest].set(jnp.where(can, True, m.mp_valid[dest])),
            mp_ref_kf=m.mp_ref_kf.at[dest].set(jnp.where(can, slot2, m.mp_ref_kf[dest])),
            n_mp=m.n_mp + jnp.sum(can.astype(jnp.int32)),
            kf_mp=m.kf_mp.at[slot1].set(jnp.where(can, dest, -1))
                         .at[slot2].set(jnp.full((F,), -1, jnp.int32).at[jnp.where(can, feat2, F - 1)].set(
                             jnp.where(can, dest, -1))),
        )
        feats1 = jnp.arange(F, dtype=jnp.int32)
        m = ms.add_observation(m, dest, jnp.full(F, slot1, jnp.int32), feats1, can)
        m = ms.add_observation(m, dest, jnp.full(F, slot2, jnp.int32), feat2, can)
        return m, int(slot2)

    def finish(self):
        """Drain async mapping and merge the final result (the reference's
        ``Shutdown`` joins its threads, ``System.cc:363-382``).  Safe to call in
        sync mode (no-op)."""
        if self._pipeline is not None:
            self._pipeline.flush()
            self._consume_pending()

    def reset(self):
        """``System::Reset`` / ``Tracking::Reset``: drop the map and return to
        NOT_INITIALIZED.  Already-recorded trajectory entries are frozen to
        absolute poses first (their reference keyframes are being discarded);
        ``ref_kf = -2`` marks them exempt from the next init's odometry
        backfill."""
        self.finish()
        if getattr(self, "last_Tcw", None) is not None and self.last_frame is not None:
            self._reset_anchor = (np.asarray(self.last_Tcw),
                                  np.asarray(self.last_frame.odom))
        kf_Tcw = None if self.map is None else np.asarray(self.map.kf_Tcw)
        fid_to_slot = self._fid_to_slot()
        for e in self.trajectory:
            if e.ref_kf >= 0:
                e.T_rel = self._entry_Tcw(e, fid_to_slot, kf_Tcw)
            if e.ref_kf != -1:
                e.ref_kf = -2
        self._kf_alive = {}
        self._dead_kf_poses = {}
        self.map = None
        self.state = tr.NOT_INITIALIZED
        self.ref_frame = None
        self.ref_frame_id = -1
        self._pending_last_frame = None
        self.last_assoc = None
        self.last_kf_slot = -1
        self.last_kf_frame_id = -1
        self.ref_kf_tracked = 0
        self.n_lost_frames = 0
        self.loop_closer = lc.LoopCloser(self.cfg)
        self.loop_closer.tracer = self.tracer

    def activate_localization_mode(self):
        """``System::ActivateLocalizationMode``: stop inserting keyframes /
        mapping; tracking continues against the frozen map."""
        self.localization_only = True

    def deactivate_localization_mode(self):
        """``System::DeactivateLocalizationMode``: resume full SLAM."""
        self.localization_only = False

    # ------------------------------------------------------------- trajectory
    def keyframe_trajectory_tum(self) -> str:
        """``SaveKeyFrameTrajectoryOdomTUM`` (``System.cc:543-585``): TUM lines
        of base-frame world poses Twb for every (current) keyframe."""
        if self.map is None:
            return ""
        lines = []
        m = self.map
        valid = np.nonzero(np.asarray(m.kf_valid))[0]
        seq = np.asarray(m.kf_seq)
        for k in sorted((int(k) for k in valid), key=lambda k: int(seq[k])):
            Twc = se3.inverse(m.kf_Tcw[k])
            Twb = ipm.Twb_from_Twc(self.cfg.extrinsics, Twc)
            q = np.asarray(Twb[:4])  # wxyz
            t = np.asarray(Twb[4:])
            ts = float(m.kf_timestamp[k])
            lines.append(
                f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}"
            )
        return "\n".join(lines) + "\n"

    def timing_stats(self) -> dict:
        """Median/mean per-frame tracking time (the reference prints these at
        exit, ``mono_encoder.cc:202-210``)."""
        if not self.frame_times:
            return {"median_s": 0.0, "mean_s": 0.0, "fps": 0.0,
                    "stages": self.tracer.report()}
        t = np.sort(np.asarray(self.frame_times))
        return {
            "median_s": float(t[len(t) // 2]),
            "mean_s": float(t.mean()),
            "fps": float(1.0 / max(t.mean(), 1e-9)),
            "stages": self.tracer.report(),
        }

    def keyframe_indices(self) -> np.ndarray:
        """Source frame id per valid keyframe (``System::SaveKeyFrameIdx``,
        ``System.cc:587-613``)."""
        if self.map is None:
            return np.zeros((0,), np.int32)
        m = self.map
        valid = np.nonzero(np.asarray(m.kf_valid))[0]
        seq = np.asarray(m.kf_seq)
        fids = np.asarray(m.kf_frame_id)
        ids = [int(fids[k]) for k in sorted(valid, key=lambda k: int(seq[k]))]
        return np.asarray(ids, np.int32)

    def frame_trajectory_Twb(self) -> np.ndarray:
        """(N, 7) per-frame base poses for ATE evaluation, composed against the
        CURRENT keyframe poses so BA / loop corrections propagate."""
        out = []
        kf_Tcw = None if self.map is None else np.asarray(self.map.kf_Tcw)
        fid_to_slot = self._fid_to_slot()
        for e in self.trajectory:
            Tcw = jnp.asarray(self._entry_Tcw(e, fid_to_slot, kf_Tcw))
            Twc = se3.inverse(Tcw)
            out.append(np.asarray(ipm.Twb_from_Twc(self.cfg.extrinsics, Twc)))
        return np.stack(out) if out else np.zeros((0, 7))
