import os
import time

import numpy as np
import pytest

from fishbirdeyevisualslam_tpu.runtime.native import AsyncPipeline, get_library


class TestAsyncPipeline:
    def test_items_flow_through_stages(self):
        log = {0: [], 1: [], 2: []}

        def make(i):
            def fn(stage, item):
                log[stage].append(item)
            return fn

        p = AsyncPipeline([make(i) for i in range(3)], capacity=4)
        try:
            for i in range(12):
                p.submit(i)
            p.flush()
            for s in range(3):
                assert log[s] == list(range(12)), (s, log[s])
                assert p.processed(s) == 12
        finally:
            p.close()

    def test_backpressure(self):
        # a slow stage bounds the queue; submit from the producer must not lose items
        done = []

        def slow(stage, item):
            time.sleep(0.005)
            done.append(item)

        p = AsyncPipeline([slow], capacity=2)
        try:
            t0 = time.time()
            for i in range(10):
                p.submit(i)
            p.flush()
            assert done == list(range(10))
            assert time.time() - t0 >= 0.04  # actually throttled by the stage
        finally:
            p.close()

    def test_abort_flag(self):
        seen = []

        def stage(st, item):
            seen.append(p.abort_requested(0))

        p = AsyncPipeline([stage], capacity=4)
        try:
            p.submit(0)
            p.flush()
            assert seen == [False]  # abort resets per item
        finally:
            p.close()

    def test_native_library_builds(self):
        # on this image g++ exists, so the native path must be active
        assert get_library() is not None


class TestCheckpoint:
    def test_map_roundtrip(self, tmp_path):
        import dataclasses
        import jax.numpy as jnp
        from fishbirdeyevisualslam_tpu.config import DEFAULT_CONFIG, CapacityConfig
        from fishbirdeyevisualslam_tpu.slam import map_state as ms
        from fishbirdeyevisualslam_tpu.io.checkpoint import save_map, load_map

        cfg = DEFAULT_CONFIG.replace(capacity=CapacityConfig(
            max_keyframes=4, max_points=16, max_bird_points=8,
            max_obs_per_point=4, max_front_kp=8, max_bird_kp=8,
            max_local_kfs=2, max_local_points=8))
        m = ms.empty_map(cfg)
        m = m._replace(
            kf_valid=m.kf_valid.at[0].set(True),
            mp_pos=m.mp_pos.at[3].set(jnp.array([1.0, 2.0, 3.0])),
            mp_valid=m.mp_valid.at[3].set(True),
            n_kf=jnp.int32(1),
        )
        path = str(tmp_path / "map.npz")
        save_map(m, path)
        m2 = load_map(path)
        for k in ms.MapState._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(m, k)), np.asarray(getattr(m2, k)), err_msg=k)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
