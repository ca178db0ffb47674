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


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
