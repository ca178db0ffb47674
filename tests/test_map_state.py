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
