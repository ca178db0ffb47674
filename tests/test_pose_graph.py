import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.solvers.ba import OdomEdges
from fishbirdeyevisualslam_tpu.solvers.pose_graph import (
    optimize_pose_graph, carry_points,
)

CFG = SystemConfig()


def circle_poses(K=12, radius=5.0):
    """Ground-truth camera poses around a circle (Tcw)."""
    poses = []
    for k in range(K):
        th = 2 * np.pi * k / K
        # camera at (r cos, r sin, 0) yaw-rotated about z
        q = se3.so3_exp_quat(jnp.array([0.0, 0.0, th]))
        t = jnp.array([radius * np.cos(th), radius * np.sin(th), 0.0], jnp.float32)
        Twc = se3.make(q, t)
        poses.append(se3.inverse(Twc))
    return jnp.stack(poses)


class TestPoseGraph:
    def test_loop_closure_distributes_drift(self):
        K = 12
        gt = circle_poses(K)
        # measured relative poses = ground truth (odometry-grade)
        rel = jax.vmap(lambda a, b: se3.compose(gt[a], se3.inverse(gt[b])))(
            jnp.arange(K - 1), jnp.arange(1, K))
        # drifted estimates: integrate rel with injected per-step error
        drift = se3.exp(jnp.array([0.0, 0.0, 0.01, 0.03, 0.0, 0.0]))
        poses = [gt[0]]
        for k in range(K - 1):
            noisy_rel = se3.compose(drift, rel[k])
            poses.append(se3.compose(se3.inverse(noisy_rel), poses[-1]))
        poses = jnp.stack(poses)
        err_before = np.abs(np.asarray(se3.log(
            se3.compose(poses[-1], se3.inverse(gt[-1]))))).max()

        # edges: chain with the TRUE relative measurements + loop edge (0, K-1)
        ei = jnp.concatenate([jnp.arange(K - 1), jnp.array([K - 1])]).astype(jnp.int32)
        ej = jnp.concatenate([jnp.arange(1, K), jnp.array([0])]).astype(jnp.int32)
        T_loop = se3.compose(gt[K - 1], se3.inverse(gt[0]))
        T_meas = jnp.concatenate([rel, T_loop[None]], axis=0)
        edges = OdomEdges(ei, ej, T_meas, jnp.full(K, 100.0), jnp.ones(K, bool))
        fixed = jnp.zeros(K, bool).at[0].set(True)
        out = optimize_pose_graph(CFG, poses, fixed, edges, n_iters=30)
        err_after = np.abs(np.asarray(se3.log(
            se3.compose(out[-1], se3.inverse(gt[-1]))))).max()
        assert err_after < 0.3 * err_before, (err_before, err_after)

    def test_long_chain_drift_distribution(self):
        """>=50-KF chain (VERDICT r1 item 10): a single loop edge must spread
        the accumulated drift across the whole graph (``OptimizeEssentialGraph``
        behavior, ``Optimizer.cc:1168-1558``), not concentrate the correction
        at the loop ends."""
        K = 60
        gt = circle_poses(K, radius=20.0)
        rel = jax.vmap(lambda a, b: se3.compose(gt[a], se3.inverse(gt[b])))(
            jnp.arange(K - 1), jnp.arange(1, K))
        drift = se3.exp(jnp.array([0.0, 0.0, 0.004, 0.02, 0.0, 0.0]))
        poses = [gt[0]]
        for k in range(K - 1):
            poses.append(se3.compose(se3.inverse(se3.compose(drift, rel[k])),
                                     poses[-1]))
        poses = jnp.stack(poses)

        def node_errs(ps):
            return np.array([
                np.abs(np.asarray(se3.log(
                    se3.compose(ps[k], se3.inverse(gt[k]))))).max()
                for k in range(K)])

        errs_before = node_errs(poses)
        ei = jnp.concatenate([jnp.arange(K - 1), jnp.array([K - 1])]).astype(jnp.int32)
        ej = jnp.concatenate([jnp.arange(1, K), jnp.array([0])]).astype(jnp.int32)
        T_loop = se3.compose(gt[K - 1], se3.inverse(gt[0]))
        T_meas = jnp.concatenate([rel, T_loop[None]], axis=0)
        # loop edge up-weighted like the essential graph's loop edges
        info = jnp.full(K, 100.0).at[K - 1].set(1000.0)
        edges = OdomEdges(ei, ej, T_meas, info, jnp.ones(K, bool))
        fixed = jnp.zeros(K, bool).at[0].set(True)
        out = optimize_pose_graph(CFG, poses, fixed, edges, n_iters=40)
        errs_after = node_errs(out)
        # end-of-chain error collapses ...
        assert errs_after[-1] < 0.25 * errs_before[-1], (
            errs_before[-1], errs_after[-1])
        # ... and the correction is DISTRIBUTED: every node (incl. mid-chain,
        # where pre-loop drift peaked at ~half the terminal error) improves to
        # well under the worst pre-optimization drift
        assert errs_after.max() < 0.5 * errs_before.max(), (
            errs_before.max(), errs_after.max())

    def test_carry_points(self):
        K = 4
        poses_old = jnp.stack([se3.random_pose(jax.random.PRNGKey(i)) for i in range(K)])
        corr = se3.exp(jnp.array([0.0, 0.1, 0.0, 0.5, -0.2, 0.1]))
        # new poses: Tcw_new = Tcw_old * corr^-1  (world moved by corr)
        poses_new = jax.vmap(lambda T: se3.compose(T, se3.inverse(corr)))(poses_old)
        pts = jax.random.normal(jax.random.PRNGKey(9), (10, 3)) * 3.0
        ref = jnp.zeros(10, jnp.int32)
        out = carry_points(pts, ref, poses_old, poses_new)
        expect = se3.transform(corr, pts)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestSpanningTree:
    def test_parent_is_best_earlier_covisible(self):
        from fishbirdeyevisualslam_tpu.solvers.pose_graph import build_pose_graph_edges
        cfg = SystemConfig()
        K = 5
        poses = jnp.tile(se3.identity()[None], (K, 1))
        covis = np.zeros((K, K), np.int32)
        covis[3, 1] = covis[1, 3] = 40   # KF3's best earlier partner is KF1
        covis[3, 2] = covis[2, 3] = 10
        bird = np.zeros((K, K), np.int32)
        bird[2, 0] = bird[0, 2] = 5      # KF2 has only a bird link, to KF0
        valid = jnp.ones(K, bool)
        no_loop = jnp.zeros((0,), jnp.int32)
        edges = build_pose_graph_edges(
            cfg, poses, jnp.asarray(covis), jnp.asarray(bird), valid,
            no_loop, no_loop, jnp.zeros((0, 7)))
        # first K edges are the spanning tree (one per node; the root's edge is
        # masked invalid — no earlier KF exists)
        tree_i = np.asarray(edges.i[:K])
        tree_j = np.asarray(edges.j[:K])
        tree_v = np.asarray(edges.valid[:K])
        assert not tree_v[0]
        tree = {int(i): int(j) for i, j, v in zip(tree_i, tree_j, tree_v) if v}
        assert tree[3] == 1          # covisibility parent
        assert tree[2] == 0          # bird-covisibility repair
        assert tree[1] == 0          # nearest-earlier fallback
        assert tree[4] == 3          # nearest-earlier fallback
