"""Loop-closure acceptance gates (r4): the odometry-consistency vet and the
projection-count verification added after the 700-frame soak exposed
repetitive-texture false loops."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3, ipm
from fishbirdeyevisualslam_tpu.slam import map_state as ms
from fishbirdeyevisualslam_tpu.slam import loop_closing as lc


def _map_on_line(cfg, n=24, step=1.0):
    """KFs along +x with odometry = ground truth."""
    m = ms.empty_map(cfg)
    K = m.K
    Tcw, od = [], []
    for k in range(n):
        Twb = jnp.asarray([1.0, 0, 0, 0, k * step, 0.0, 0.0], jnp.float32)
        Tcw.append(ipm.Tcw_from_Twb(cfg.extrinsics, Twb))
        od.append([k * step, 0.0, 0.0])
    kf_Tcw = m.kf_Tcw.at[:n].set(jnp.stack(Tcw))
    return m._replace(
        kf_Tcw=kf_Tcw,
        kf_valid=m.kf_valid.at[:n].set(True),
        kf_seq=m.kf_seq.at[:n].set(jnp.arange(n)),
        kf_odom=m.kf_odom.at[:n].set(jnp.asarray(od, jnp.float32)),
        n_kf=jnp.int32(n), kf_counter=jnp.int32(n),
    )


class TestOdomConsistency:
    def test_identity_correction_consistent(self):
        cfg = SystemConfig()
        m = _map_on_line(cfg)
        closer = lc.LoopCloser(cfg)
        assert closer._odom_consistent(m, 20, 2, se3.identity())

    def test_teleporting_correction_rejected(self):
        """A correction that claims the current KF sits 15 m from where the
        odometry places it (relative to the candidate) must be rejected —
        the path between is only 18 m, so the budget is ~1.4 m."""
        cfg = SystemConfig()
        m = _map_on_line(cfg)
        # T_corr maps drifted world -> loop world; a 15 m x-shift correction
        T_corr = jnp.asarray([1.0, 0, 0, 0, 15.0, 0.0, 0.0], jnp.float32)
        closer = lc.LoopCloser(cfg)
        assert not closer._odom_consistent(m, 20, 2, T_corr)

    def test_drift_scale_correction_accepted_on_long_path(self):
        """A 2 m correction over a 200 m path is within the drift budget."""
        cfg = SystemConfig()
        m = _map_on_line(cfg, n=21, step=10.0)  # 200 m path
        T_corr = jnp.asarray([1.0, 0, 0, 0, 2.0, 0.0, 0.0], jnp.float32)
        closer = lc.LoopCloser(cfg)
        assert closer._odom_consistent(m, 20, 0, T_corr)


class TestProjectionGate:
    def test_counts_reprojected_neighborhood(self):
        """Map points observed by the candidate's group and genuinely visible
        in the current KF count; with an absurd correction they do not."""
        cfg = SystemConfig()
        m = _map_on_line(cfg, n=6, step=0.5)
        P = m.mp_pos.shape[0]
        F = m.kf_uv.shape[1]
        rng = np.random.RandomState(0)
        n_pts = 64
        # points in front of KF0's camera, observed by KFs 0 and 1
        from fishbirdeyevisualslam_tpu.geometry import camera as cam_ops
        Twc0 = se3.inverse(m.kf_Tcw[0])
        Xc = jnp.asarray(np.stack([rng.uniform(-3, 3, n_pts),
                                   rng.uniform(-1, 1, n_pts),
                                   rng.uniform(8, 20, n_pts)], -1), jnp.float32)
        Xw = se3.transform(Twc0, Xc)
        from fishbirdeyevisualslam_tpu.slam.frame import desc_pm1_from_packed
        desc = rng.randint(0, 2**32, (n_pts, 8), dtype=np.uint64).astype(np.uint32)
        pm1 = np.asarray(desc_pm1_from_packed(jnp.asarray(desc)))
        m = m._replace(
            mp_pos=m.mp_pos.at[:n_pts].set(Xw),
            mp_desc_pm1=m.mp_desc_pm1.at[:n_pts].set(
                jnp.asarray(pm1, jnp.bfloat16)),
            mp_valid=m.mp_valid.at[:n_pts].set(True),
            obs_kf=m.obs_kf.at[:n_pts, 0].set(0).at[:n_pts, 1].set(1),
            obs_valid=m.obs_valid.at[:n_pts, 0].set(True)
                       .at[:n_pts, 1].set(True),
        )
        # make KF5 share a point with KF0/1 so they are covisible
        m = m._replace(obs_kf=m.obs_kf.at[0, 2].set(5),
                       obs_valid=m.obs_valid.at[0, 2].set(True))
        # current KF = 5, candidate = 0.  Give KF5 features whose uv/desc
        # match the points as seen from KF0's pose under T_corr = the true
        # relative transform (so projection aligns exactly).
        # Q = Tcw_cur o T_corr^-1 must equal Tcw_cand (KF5 "really" sits at
        # KF0's pose): T_corr = Tcw_cand^-1 o Tcw_cur
        T_corr = se3.compose(se3.inverse(m.kf_Tcw[0]), m.kf_Tcw[5])
        # project points into KF0's camera: uv
        pc0 = se3.transform(m.kf_Tcw[0], Xw)
        uv0 = cam_ops.project_pinhole(cfg.camera, pc0)
        m = m._replace(
            kf_uv=m.kf_uv.at[5, :n_pts].set(uv0),
            kf_desc=m.kf_desc.at[5, :n_pts].set(jnp.asarray(desc)),
            kf_kp_valid=m.kf_kp_valid.at[5, :n_pts].set(True),
        )
        n_good = int(lc.verify_loop_projection(
            m, jnp.int32(5), jnp.int32(0), T_corr, cfg))
        assert n_good >= n_pts - 4, n_good
        # absurd correction: nothing projects into the window
        T_bad = se3.compose(
            jnp.asarray([1.0, 0, 0, 0, 500.0, 0.0, 0.0], jnp.float32), T_corr)
        n_bad = int(lc.verify_loop_projection(
            m, jnp.int32(5), jnp.int32(0), T_bad, cfg))
        assert n_bad < 5, n_bad


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
