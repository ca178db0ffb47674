import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.geometry import se3, sim3
from fishbirdeyevisualslam_tpu.solvers.sim3_pose_graph import (
    Sim3Edges, optimize_sim3_pose_graph, carry_points_sim3,
)


def circle_poses(K=12, radius=5.0):
    poses = []
    for k in range(K):
        th = 2 * np.pi * k / K
        q = se3.so3_exp_quat(jnp.array([0.0, 0.0, th]))
        t = jnp.array([radius * np.cos(th), radius * np.sin(th), 0.0], jnp.float32)
        poses.append(se3.inverse(se3.make(q, t)))
    return jnp.stack(poses)


class TestSim3PoseGraph:
    def test_scale_drift_corrected_by_loop(self):
        """Monocular scale drift: each odometry step is measured 3% too large;
        the loop edge (true relative Sim3) must pull scales back toward 1."""
        K = 12
        gt = circle_poses(K)
        S_gt = sim3.from_se3(gt)
        rel_gt = jax.vmap(lambda a, b: sim3.compose(S_gt[a], sim3.inverse(S_gt[b])))(
            jnp.arange(K - 1), jnp.arange(1, K))
        # drifted measurements: scale inflated + rotation/translation error per
        # step (the SE3 test's drift plus the monocular scale component)
        drift = sim3.exp(jnp.array([0.0, 0.0, 0.01, 0.03, 0.0, 0.0, np.log(1.03)]))
        rel_meas = jax.vmap(lambda S: sim3.compose(drift, S))(rel_gt)
        # estimates integrate the drifted chain
        S = [S_gt[0]]
        for k in range(K - 1):
            S.append(sim3.compose(sim3.inverse(rel_meas[k]), S[-1]))
        S = jnp.stack(S)
        # integrating S_j = rel^-1 * S_i with inflated rel scale shrinks the
        # estimate scale: (1/1.03)^(K-1) ~ 0.72
        scale_before = float(sim3.scale(S[-1]))
        assert scale_before < 0.8  # drift accumulated

        ei = jnp.concatenate([jnp.arange(K - 1), jnp.array([K - 1])]).astype(jnp.int32)
        ej = jnp.concatenate([jnp.arange(1, K), jnp.array([0])]).astype(jnp.int32)
        S_loop = sim3.compose(S_gt[K - 1], sim3.inverse(S_gt[0]))
        S_meas = jnp.concatenate([rel_meas, S_loop[None]], axis=0)
        edges = Sim3Edges(ei, ej, S_meas, jnp.full(K, 100.0), jnp.ones(K, bool))
        fixed = jnp.zeros(K, bool).at[0].set(True)
        out = optimize_sim3_pose_graph(S, fixed, edges, n_iters=25)
        scale_after = float(sim3.scale(out[-1]))
        # last vertex closes onto vertex 0 through the loop edge: scale ~ 1
        assert abs(scale_after - 1.0) < 0.05, (scale_before, scale_after)
        # camera-center error of the endpoint shrinks substantially
        def center(Sv):
            return np.asarray(se3.inverse(sim3.to_se3(Sv)))[4:]
        err_before = np.linalg.norm(center(S[-1]) - center(S_gt[-1]))
        err_after = np.linalg.norm(center(out[-1]) - center(S_gt[-1]))
        assert err_after < 0.3 * err_before, (err_before, err_after)

    def test_exact_measurements_are_fixed_point(self):
        K = 8
        gt = circle_poses(K)
        S_gt = sim3.from_se3(gt)
        ei = jnp.arange(K - 1, dtype=jnp.int32)
        ej = jnp.arange(1, K, dtype=jnp.int32)
        S_meas = jax.vmap(lambda a, b: sim3.compose(S_gt[a], sim3.inverse(S_gt[b])))(ei, ej)
        edges = Sim3Edges(ei, ej, S_meas, jnp.full(K - 1, 100.0), jnp.ones(K - 1, bool))
        fixed = jnp.zeros(K, bool).at[0].set(True)
        out = optimize_sim3_pose_graph(S_gt, fixed, edges, n_iters=5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(S_gt), atol=1e-4)

    def test_carry_points_sim3(self):
        K = 3
        S_old = jnp.stack([
            sim3.from_se3(se3.random_pose(jax.random.PRNGKey(i))) for i in range(K)])
        corr = sim3.exp(jnp.array([0.0, 0.1, 0.0, 0.5, -0.2, 0.1, np.log(1.2)]))
        S_new = jax.vmap(lambda S: sim3.compose(S, sim3.inverse(corr)))(S_old)
        pts = jax.random.normal(jax.random.PRNGKey(9), (10, 3)) * 3.0
        ref = jnp.zeros(10, jnp.int32)
        out = carry_points_sim3(pts, ref, S_old, S_new)
        expect = sim3.transform(corr, pts)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
