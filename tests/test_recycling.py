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


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
