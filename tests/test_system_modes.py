"""System facade runtime modes: Reset, ActivateLocalizationMode analogs.

Reference: ``System::Reset`` / ``ActivateLocalizationMode`` are runtime
requests checked per tracked frame (``System.cc:279-330``); reset is also
triggered by Tracking itself when lost with <= 5 keyframes
(``Tracking.cc:731-740``).
"""

import numpy as np
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.io import synthetic
from fishbirdeyevisualslam_tpu.io.evaluate import ate_rmse_vs_gt
from fishbirdeyevisualslam_tpu.slam.system import SlamSystem

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier


class TestSystemModes:
    def test_reset_reinitializes_and_keeps_trajectory_length(self):
        cfg = SystemConfig()
        seq = synthetic.make_sequence(cfg, n_frames=12, kind="arc", step=0.5)
        sys_ = SlamSystem(cfg)
        for i in range(6):
            fr = seq.frames[i]
            sys_.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i], fr["timestamp"])
        assert sys_.map is not None and int(sys_.map.n_kf) >= 2
        sys_.reset()
        assert sys_.map is None and sys_.state == 0  # NOT_INITIALIZED
        # pre-reset entries are frozen absolute (-2), never rewritten later
        frozen = [e.ref_kf for e in sys_.trajectory]
        assert all(r == -2 for r in frozen)
        for i in range(6, 12):
            fr = seq.frames[i]
            sys_.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i], fr["timestamp"])
        # re-initialized into a fresh map and tracked again
        assert sys_.map is not None and int(sys_.map.n_kf) >= 2
        assert sys_.trajectory[-1].state == 1  # OK
        est = sys_.frame_trajectory_Twb()
        assert est.shape == (12, 7)
        assert np.isfinite(est).all()

    def test_localization_mode_freezes_map(self):
        cfg = SystemConfig()
        seq = synthetic.make_sequence(cfg, n_frames=12, kind="arc", step=0.5)
        sys_ = SlamSystem(cfg)
        for i in range(8):
            fr = seq.frames[i]
            sys_.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i], fr["timestamp"])
        n_kf = int(sys_.map.n_kf)
        n_mp = int(np.asarray(sys_.map.mp_valid).sum())
        sys_.activate_localization_mode()
        for i in range(8, 12):
            fr = seq.frames[i]
            sys_.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i], fr["timestamp"])
        # map untouched, tracking still OK and accurate
        assert int(sys_.map.n_kf) == n_kf
        assert int(np.asarray(sys_.map.mp_valid).sum()) == n_mp
        assert sys_.trajectory[-1].state == 1
        ate = ate_rmse_vs_gt(sys_.frame_trajectory_Twb(), seq.gt)
        assert ate < 0.15, ate
        sys_.deactivate_localization_mode()
        assert not sys_.localization_only
