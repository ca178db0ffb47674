import numpy as np
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.io import synthetic
from fishbirdeyevisualslam_tpu.slam.bird_odometer import BirdOdometer, edge_cloud, icp_se2


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
