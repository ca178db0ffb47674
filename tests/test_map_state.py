import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import DEFAULT_CONFIG, CapacityConfig
from fishbirdeyevisualslam_tpu.slam import map_state as ms

CFG = DEFAULT_CONFIG.replace(capacity=CapacityConfig(
    max_keyframes=8, max_points=64, max_bird_points=32,
    max_obs_per_point=4, max_front_kp=16, max_bird_kp=16,
    max_local_kfs=4, max_local_points=32,
))


class TestObservations:
    def test_add_single(self):
        m = ms.empty_map(CFG)
        m = m._replace(mp_valid=m.mp_valid.at[0].set(True))
        m = ms.add_observation(
            m, jnp.array([0]), jnp.array([2]), jnp.array([5]), jnp.array([True]))
        assert bool(m.obs_valid[0, 0])
        assert int(m.obs_kf[0, 0]) == 2 and int(m.obs_feat[0, 0]) == 5

    def test_add_batch_same_point(self):
        # several observations of the same point in one batch land in distinct slots
        m = ms.empty_map(CFG)
        m = m._replace(mp_valid=m.mp_valid.at[3].set(True))
        m = ms.add_observation(
            m,
            jnp.array([3, 3, 3]),
            jnp.array([0, 1, 2]),
            jnp.array([7, 8, 9]),
            jnp.array([True, True, True]),
        )
        assert int(m.obs_valid[3].sum()) == 3
        kfs = sorted(np.asarray(m.obs_kf[3])[np.asarray(m.obs_valid[3])].tolist())
        assert kfs == [0, 1, 2]

    def test_overflow_dropped(self):
        m = ms.empty_map(CFG)
        n = 6  # capacity M = 4
        m = ms.add_observation(
            m, jnp.zeros(n, jnp.int32), jnp.arange(n, dtype=jnp.int32),
            jnp.arange(n, dtype=jnp.int32), jnp.ones(n, bool))
        assert int(m.obs_valid[0].sum()) == 4  # extra silently dropped

    def test_invalid_not_added(self):
        m = ms.empty_map(CFG)
        m = ms.add_observation(
            m, jnp.array([1]), jnp.array([0]), jnp.array([0]), jnp.array([False]))
        assert int(m.obs_valid.sum()) == 0


class TestCovisibility:
    def test_counts(self):
        m = ms.empty_map(CFG)
        # two points: point 0 seen by KFs (0,1); point 1 seen by (1,2)
        m = m._replace(mp_valid=m.mp_valid.at[0].set(True).at[1].set(True))
        m = ms.add_observation(
            m,
            jnp.array([0, 0, 1, 1]),
            jnp.array([0, 1, 1, 2]),
            jnp.array([0, 0, 1, 1]),
            jnp.ones(4, bool),
        )
        C = np.asarray(ms.covisibility_counts(m))
        assert C[0, 1] == 1 and C[1, 0] == 1
        assert C[1, 2] == 1 and C[2, 1] == 1
        assert C[0, 2] == 0
        assert (np.diag(C) == 0).all()

    def test_invalid_point_ignored(self):
        m = ms.empty_map(CFG)
        m = ms.add_observation(
            m, jnp.array([0, 0]), jnp.array([0, 1]), jnp.array([0, 0]), jnp.ones(2, bool))
        # point 0 never marked valid
        C = np.asarray(ms.covisibility_counts(m))
        assert C.sum() == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestFuseMerge:
    def test_duplicate_points_merge(self):
        import jax
        import jax.numpy as jnp
        from fishbirdeyevisualslam_tpu.slam import tracking as tr
        from fishbirdeyevisualslam_tpu.ops import orb
        from fishbirdeyevisualslam_tpu.geometry import se3, camera
        import numpy as np

        cfg = CFG
        m = ms.empty_map(cfg)
        rng = np.random.RandomState(0)
        # two KFs at identity-ish poses; one world point duplicated as ids 0, 1
        Xw = jnp.array([2.0, 0.5, 10.0])
        desc_bits = jnp.asarray(rng.randint(0, 2, (1, 256)).astype(np.uint8))
        packed = orb.pack_bits(desc_bits)[0]
        uv = camera.project_pinhole(cfg.camera, Xw)
        kf0, kf1 = 0, 1
        m = m._replace(
            kf_valid=m.kf_valid.at[kf0].set(True).at[kf1].set(True),
            kf_Tcw=m.kf_Tcw,  # identity
            kf_uv=m.kf_uv.at[kf1, 3].set(uv),
            kf_desc=m.kf_desc.at[kf1, 3].set(packed),
            kf_kp_valid=m.kf_kp_valid.at[kf1, 3].set(True),
            # point 0 owned by kf0 feature 2; point 1 owned by kf1 feature 3
            mp_pos=m.mp_pos.at[0].set(Xw).at[1].set(Xw + 0.01),
            mp_desc=m.mp_desc.at[0].set(packed).at[1].set(packed),
            mp_desc_pm1=m.mp_desc_pm1.at[0].set(
                orb.bits_to_pm1(desc_bits)[0]).at[1].set(
                orb.bits_to_pm1(desc_bits)[0]),
            mp_valid=m.mp_valid.at[0].set(True).at[1].set(True),
            kf_mp=m.kf_mp.at[kf0, 2].set(0).at[kf1, 3].set(1),
            n_kf=jnp.int32(2),
        )
        # give point 0 two observations so it wins the merge
        m = ms.add_observation(m, jnp.array([0, 0, 1]), jnp.array([0, 1, 1]),
                               jnp.array([2, 5, 3]), jnp.ones(3, bool))
        m2 = tr.fuse_neighbors(m, jnp.int32(kf0), jnp.int32(kf1), cfg)
        # point 1 merged into point 0
        assert not bool(m2.mp_valid[1])
        assert bool(m2.mp_valid[0])
        assert int(m2.kf_mp[kf1, 3]) == 0  # redirected
