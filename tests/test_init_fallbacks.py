"""Bird-seeded initialization and world-gauge chaining (the post-reset
continuity machinery added on top of the reference's front-only init)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3, odometry as odo
from fishbirdeyevisualslam_tpu.io import synthetic
from fishbirdeyevisualslam_tpu.slam.frame import build_frame
from fishbirdeyevisualslam_tpu.slam import tracking as tr
from fishbirdeyevisualslam_tpu.slam import map_state as ms

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier


def _frames(cfg, n=2, kind="arc", noise=0.0, seed=0):
    seq = synthetic.make_sequence(cfg, n_frames=n, kind=kind,
                                  odom_noise=noise, seed=seed)
    out = []
    for i in range(n):
        fr = seq.frames[i]
        out.append(build_frame(
            jnp.asarray(fr["front"], jnp.float32), jnp.asarray(fr["bird"], jnp.float32),
            jnp.asarray(fr["mask"]), jnp.asarray(seq.odom[i], jnp.float32),
            jnp.asarray(fr["timestamp"], jnp.float32), cfg, cfg.capacity.max_front_kp))
    return seq, out


class TestBirdSeededInit:
    def test_recovers_relative_pose_from_bird_points(self):
        cfg = SystemConfig()
        seq, (f1, f2) = _frames(cfg, 2, kind="arc", noise=0.0)
        res = tr.match_for_init(f1, f2, cfg)
        T21_odom = se3.inverse(odo.preintegrate_cam(cfg.extrinsics, f1.odom, f2.odom))
        init_out, n_bird = tr.bird_seeded_init(f1, f2, cfg, res, T21_odom)
        assert int(n_bird) >= cfg.tracking.min_bird_init_matches
        assert bool(init_out.success)
        # odometry is exact here, so the Horn pose must agree with it closely
        err = np.abs(np.asarray(se3.log(se3.compose(
            init_out.T21, se3.inverse(T21_odom)))))
        assert err.max() < 0.05, err


class TestWorldGauge:
    def test_reprojection_invariance(self):
        cfg = SystemConfig()
        seq, (f1, f2) = _frames(cfg, 2, kind="arc", noise=0.0)
        res = tr.match_for_init(f1, f2, cfg)
        T21_odom = se3.inverse(odo.preintegrate_cam(cfg.extrinsics, f1.odom, f2.odom))
        init_out, _ = tr.bird_seeded_init(f1, f2, cfg, res, T21_odom)
        m = tr.create_initial_map(f1, f2, init_out, cfg, res,
                                  jnp.asarray([0, 1], jnp.int32))
        Tcw1 = se3.make(se3.so3_exp_quat(jnp.asarray([0.1, -0.2, 0.3])),
                        jnp.asarray([1.0, -2.0, 0.5]))
        m2 = tr.apply_world_gauge(m, Tcw1)
        # camera-frame coordinates of every (KF, point) pair are invariant
        for k in range(2):
            pc_old = np.asarray(se3.transform(m.kf_Tcw[k], m.mp_pos))
            pc_new = np.asarray(se3.transform(m2.kf_Tcw[k], m2.mp_pos))
            valid = np.asarray(m.mp_valid)
            if valid.any():
                np.testing.assert_allclose(pc_old[valid], pc_new[valid],
                                           rtol=1e-4, atol=1e-4)
            bc_old = np.asarray(se3.transform(m.kf_Tcw[k], m.bp_pos))
            bc_new = np.asarray(se3.transform(m2.kf_Tcw[k], m2.bp_pos))
            bvalid = np.asarray(m.bp_valid)
            np.testing.assert_allclose(bc_old[bvalid], bc_new[bvalid],
                                       rtol=1e-4, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
