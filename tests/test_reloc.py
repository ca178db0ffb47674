"""Kidnapped-robot relocalization: recovery from a wildly wrong pose belief.

The round-1 LSH place recognition needed a 10 m position gate, which made
relocalization impossible exactly when it matters (drift larger than the
gate).  With the trained vocabulary the BoW candidates are found purely by
appearance: a lost system whose pose belief is >15 m off must still relocalize
when revisiting mapped terrain (``Tracking::Relocalization``,
``Tracking.cc:2231-2392``).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3, ipm
from fishbirdeyevisualslam_tpu.io import synthetic
from fishbirdeyevisualslam_tpu.slam import tracking as tr
from fishbirdeyevisualslam_tpu.slam.system import SlamSystem

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier


@pytest.fixture(scope="module")
def mapped_run():
    cfg = SystemConfig()
    seq = synthetic.make_sequence(cfg, n_frames=14, kind="arc", step=0.5)
    sys_ = SlamSystem(cfg)
    for i, fr in enumerate(seq.frames):
        sys_.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i],
                   fr["timestamp"], contour=fr["contour"])
    return cfg, seq, sys_


class TestKidnappedReloc:
    def test_recovers_from_20m_drift(self, mapped_run):
        cfg, seq, sys_ = mapped_run
        assert sys_.state == tr.OK and int(sys_.map.n_kf) >= 3
        # the system's own (pre-kidnap) estimate of the revisited frame is the
        # oracle — it lives in the map's world frame
        revisit = 6
        gt_Twb = sys_.frame_trajectory_Twb()[revisit]

        # kidnap: corrupt the pose belief by >15 m and declare LOST
        drift = se3.exp(jnp.asarray([0.0, 0.0, 0.3, 18.0, 9.0, 0.0], jnp.float32))
        sys_.state = tr.LOST
        sys_.n_lost_frames = 1
        sys_.last_Tcw = np.asarray(se3.compose(jnp.asarray(sys_.last_Tcw), drift))
        sys_._reloc_frame_id = -10000

        fr = seq.frames[revisit]
        # odometry continues from the last reading (so the motion prior stays
        # wrong); only appearance can recover the pose
        Tcw = sys_.track(fr["front"], fr["bird"], fr["mask"], seq.odom[-1],
                         fr["timestamp"], contour=fr["contour"])
        assert sys_.state == tr.OK, "relocalization must succeed"
        Twb = np.asarray(ipm.Twb_from_Twc(
            cfg.extrinsics, se3.inverse(jnp.asarray(Tcw))))
        err = np.linalg.norm(Twb[4:6] - gt_Twb[4:6])
        assert err < 1.0, f"relocalized {err:.2f} m from the revisited pose"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
