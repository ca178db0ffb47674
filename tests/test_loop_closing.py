"""Loop-transform and loop-correction tests.

The reference computes the loop Sim3 from map-point pairs only
(``LoopClosing::ComputeSim3``); this build additionally lifts matched bird
keypoints through the two keyframe poses (exact metric 3D from IPM), which is
what closes loops after feature-poor stretches.  These tests validate that path
deterministically without rendering a full sequence.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig, CapacityConfig
from fishbirdeyevisualslam_tpu.geometry import se3, sim3
from fishbirdeyevisualslam_tpu.slam import map_state as ms
from fishbirdeyevisualslam_tpu.slam import loop_closing as lc

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier

CFG = SystemConfig().replace(capacity=CapacityConfig(
    max_keyframes=16, max_points=256, max_bird_points=256,
    max_obs_per_point=8, max_front_kp=64, max_bird_kp=64,
    max_local_kfs=8, max_local_points=128))


def make_two_kf_map(drift_xi, n_bird=48, seed=0):
    """Two KFs seeing the same bird landmarks; KF 1's stored pose carries a
    world-level drift D (stored = true ∘ D, i.e. it maps DRIFTED world coords
    to the camera)."""
    rng = np.random.RandomState(seed)
    m = ms.empty_map(CFG)
    Xw = np.stack([
        rng.uniform(2, 12, n_bird), rng.uniform(-6, 6, n_bird), np.zeros(n_bird)
    ], -1).astype(np.float32)
    desc = rng.randint(0, 2**32, (n_bird, 8), dtype=np.uint64).astype(np.uint32)
    Tcw_a = se3.identity()
    Tcw_b_true = se3.exp(jnp.asarray([0, 0, 0.05, 0.3, 0.1, 0], jnp.float32))
    D = se3.exp(jnp.asarray(drift_xi, jnp.float32))
    T_stored = se3.compose(Tcw_b_true, D)
    cam_a = np.asarray(se3.transform(Tcw_a, jnp.asarray(Xw)))
    cam_b = np.asarray(se3.transform(Tcw_b_true, jnp.asarray(Xw)))

    def fill(mm, slot, Tcw, cams):
        return mm._replace(
            kf_Tcw=mm.kf_Tcw.at[slot].set(Tcw),
            kf_valid=mm.kf_valid.at[slot].set(True),
            kf_bird_cam=mm.kf_bird_cam.at[slot, :n_bird].set(jnp.asarray(cams)),
            kf_bird_desc=mm.kf_bird_desc.at[slot, :n_bird].set(jnp.asarray(desc)),
            kf_bird_kp_valid=mm.kf_bird_kp_valid.at[slot, :n_bird].set(True),
        )

    m = fill(m, 0, Tcw_a, cam_a)
    m = fill(m, 1, T_stored, cam_b)
    m = m._replace(n_kf=jnp.int32(2))
    return m, D, Tcw_b_true


class TestLoopTransform:
    def test_bird_keypoints_recover_drift(self):
        # no front map points at all: the bird-keypoint route alone must
        # recover the drift (the reference's map-point-only route would starve)
        m, D, _ = make_two_kf_map([0.0, 0.0, 0.04, 0.5, -0.3, 0.0])
        S, n_in, ok = lc.compute_loop_transform(
            m, jnp.int32(1), jnp.int32(0), CFG, jax.random.PRNGKey(0))
        assert bool(ok)
        assert int(n_in) >= 40
        T = sim3.to_se3(S)
        err = np.abs(np.asarray(se3.log(se3.compose(T, se3.inverse(D)))))
        assert err.max() < 1e-3, (np.asarray(T), np.asarray(D))

    def test_no_drift_gives_identity(self):
        m, D, _ = make_two_kf_map([0.0] * 6)
        S, n_in, ok = lc.compute_loop_transform(
            m, jnp.int32(1), jnp.int32(0), CFG, jax.random.PRNGKey(1))
        assert bool(ok)
        err = np.abs(np.asarray(se3.log(sim3.to_se3(S))))
        assert err.max() < 1e-3

    def test_correct_loop_distributes_drift(self):
        """8-KF drifted chain, bird-keypoint loop between the endpoints: the
        transform + essential graph must shrink the endpoint error a lot (the
        chain edges are measured from the drifted poses, so exact restoration
        is not the optimum — drift is distributed, as in the reference)."""
        K, n_bird = 8, 48
        rng = np.random.RandomState(3)
        gt = []
        for k in range(K):
            gt.append(se3.inverse(se3.make(
                jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                jnp.asarray([0.6 * k, 0.05 * k, 0.0], jnp.float32))))
        gt = jnp.stack(gt)
        rel = jax.vmap(lambda a, b: se3.compose(gt[a], se3.inverse(gt[b])))(
            jnp.arange(K - 1), jnp.arange(1, K))
        drift = se3.exp(jnp.asarray([0, 0, 0.006, 0.05, 0.02, 0], jnp.float32))
        stored = [gt[0]]
        for k in range(K - 1):
            stored.append(se3.compose(se3.inverse(se3.compose(drift, rel[k])), stored[-1]))
        stored = jnp.stack(stored)

        m = ms.empty_map(CFG)
        m = m._replace(
            kf_Tcw=m.kf_Tcw.at[:K].set(stored),
            kf_valid=m.kf_valid.at[:K].set(True),
            n_kf=jnp.int32(K),
        )
        # shared bird landmarks observed (with TRUE geometry) by KF 0 and K-1
        Xw = np.stack([
            rng.uniform(2, 12, n_bird), rng.uniform(-6, 6, n_bird), np.zeros(n_bird)
        ], -1).astype(np.float32)
        desc = rng.randint(0, 2**32, (n_bird, 8), dtype=np.uint64).astype(np.uint32)
        for slot in (0, K - 1):
            cams = se3.transform(gt[slot], jnp.asarray(Xw))
            m = m._replace(
                kf_bird_cam=m.kf_bird_cam.at[slot, :n_bird].set(cams),
                kf_bird_desc=m.kf_bird_desc.at[slot, :n_bird].set(jnp.asarray(desc)),
                kf_bird_kp_valid=m.kf_bird_kp_valid.at[slot, :n_bird].set(True),
            )
        S, n_in, ok = lc.compute_loop_transform(
            m, jnp.int32(K - 1), jnp.int32(0), CFG, jax.random.PRNGKey(2))
        assert bool(ok)
        m2 = lc.correct_loop(m, jnp.int32(K - 1), jnp.int32(0), S, CFG)
        err_before = np.abs(np.asarray(se3.log(
            se3.compose(stored[K - 1], se3.inverse(gt[K - 1]))))).max()
        err_after = np.abs(np.asarray(se3.log(
            se3.compose(m2.kf_Tcw[K - 1], se3.inverse(gt[K - 1]))))).max()
        assert err_after < 0.3 * err_before, (err_before, err_after)


@pytest.mark.skipif(not os.environ.get("FBEV_SLOW_TESTS"),
                    reason="full rectangle-loop e2e run (~20 min on a 2-CPU box); "
                           "set FBEV_SLOW_TESTS=1 to run")
class TestRectangleLoopE2E:
    def test_rect_loop_closes(self):
        from fishbirdeyevisualslam_tpu.io.synthetic import make_sequence
        from fishbirdeyevisualslam_tpu.io.evaluate import ate_rmse_vs_gt
        from fishbirdeyevisualslam_tpu.slam.system import SlamSystem
        cfg = SystemConfig()
        seq = make_sequence(cfg, n_frames=160, kind="rect", odom_noise=0.02, seed=0)
        slam = SlamSystem(cfg)
        for i, fr in enumerate(seq.frames):
            slam.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i], fr["timestamp"])
        slam.finish()
        assert slam.n_loops_closed >= 1
        ate = ate_rmse_vs_gt(slam.frame_trajectory_Twb(), seq.gt)
        assert ate < 0.5, ate


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
