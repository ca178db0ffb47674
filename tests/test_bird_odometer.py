import numpy as np
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.io import synthetic
from fishbirdeyevisualslam_tpu.slam.bird_odometer import BirdOdometer, edge_cloud, icp_se2

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier


class TestBirdOdometer:
    def test_edge_cloud_metric(self):
        import jax.numpy as jnp
        cfg = SystemConfig()
        world = synthetic.make_world(3)
        bird = synthetic.render_bird(world, cfg, [0.0, 0.0, 0.0])
        mask, _ = synthetic.bird_mask_and_contour(cfg, bird)
        c = edge_cloud(jnp.asarray(bird), jnp.asarray(mask), cfg)
        xy = np.asarray(c.xy)[np.asarray(c.valid)]
        assert len(xy) > 300
        # points lie within the bird-view metric extent (~7.6m half-extent)
        assert np.abs(xy).max() < 12.0

    def test_odometry_on_straight_drive(self):
        cfg = SystemConfig()
        world = synthetic.make_world(4)
        gt = synthetic.make_trajectory(8, kind="straight", step=0.3)
        odo = BirdOdometer(cfg)
        poses = []
        for p in gt:
            bird = synthetic.render_bird(world, cfg, p)
            mask, _ = synthetic.bird_mask_and_contour(cfg, bird)
            poses.append(odo.add_new_frame(bird, mask))
        poses = np.stack(poses)
        # relative displacement between consecutive frames ~ step
        d = np.linalg.norm(np.diff(poses[:, :2], axis=0), axis=1)
        # first frame sets the key cloud; later steps should recover ~0.3m
        assert np.all(np.abs(d[1:] - 0.3) < 0.12), d


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestNDT:
    def test_grid_build(self):
        import jax.numpy as jnp
        from fishbirdeyevisualslam_tpu.slam.bird_odometer import (
            EdgeCloud, build_ndt_grid, NDT_GRID, NDT_EXTENT,
        )
        rng = np.random.RandomState(0)
        # a tight cluster at (1.0, 2.0)
        pts = np.concatenate([
            np.array([[1.0, 2.0]]) + rng.randn(50, 2) * 0.05,
            np.array([[-3.0, -4.0]]) + rng.randn(50, 2) * 0.05,
        ]).astype(np.float32)
        g = build_ndt_grid(EdgeCloud(jnp.asarray(pts), jnp.ones(100, bool)))
        cell = 2 * NDT_EXTENT / NDT_GRID
        vid = (int((1.0 + NDT_EXTENT) / cell) * NDT_GRID
               + int((2.0 + NDT_EXTENT) / cell))
        assert bool(g.ok[vid])
        np.testing.assert_allclose(np.asarray(g.mu[vid]), [1.0, 2.0], atol=0.05)

    def test_ndt_recovers_known_se2(self):
        import jax.numpy as jnp
        from fishbirdeyevisualslam_tpu.slam.bird_odometer import (
            EdgeCloud, build_ndt_grid, ndt_se2,
        )
        rng = np.random.RandomState(1)
        # structured scene: two perpendicular line features + corner blobs
        t = rng.uniform(-6, 6, 300)
        pts = np.concatenate([
            np.stack([t[:150], 0.3 * np.ones(150)], -1),
            np.stack([-2.0 * np.ones(150), t[150:]], -1),
            rng.uniform(-5, 5, (100, 2)),
        ]).astype(np.float32)
        pts += rng.randn(*pts.shape).astype(np.float32) * 0.02
        ref = EdgeCloud(jnp.asarray(pts), jnp.ones(len(pts), bool))
        # current cloud = ref moved by the INVERSE of (x, y, th)
        x, y, th = 0.25, -0.15, np.deg2rad(4.0)
        c, s = np.cos(th), np.sin(th)
        # we want T(cur) = ref with T = (x, y, th): cur = R^-1 (ref - t)
        moved = (pts - np.array([x, y])) @ np.array([[c, -s], [s, c]])
        cur = EdgeCloud(jnp.asarray(moved.astype(np.float32)), jnp.ones(len(pts), bool))
        grid = build_ndt_grid(ref)
        est = np.asarray(ndt_se2(grid, cur, jnp.zeros(3, jnp.float32)))
        np.testing.assert_allclose(est, [x, y, th], atol=0.03)

    def test_odometer_ndt_straight_drive(self):
        cfg = SystemConfig()
        world = synthetic.make_world(4)
        gt = synthetic.make_trajectory(8, kind="straight", step=0.3)
        odo = BirdOdometer(cfg, method="ndt")
        poses = []
        for p in gt:
            bird = synthetic.render_bird(world, cfg, p)
            mask, _ = synthetic.bird_mask_and_contour(cfg, bird)
            poses.append(odo.add_new_frame(bird, mask))
        poses = np.stack(poses)
        d = np.linalg.norm(np.diff(poses[:, :2], axis=0), axis=1)
        assert np.all(np.abs(d[1:] - 0.3) < 0.12), d
