"""EdgeFilterIPM analog (ops/edge_filter.py): Otsu, Canny, component sizes,
focal-ray artifact removal, and the full pipeline through the odometer."""

import numpy as np
import pytest
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.ops import edge_filter as ef


class TestOtsu:
    def test_bimodal(self):
        rng = np.random.RandomState(0)
        img = np.where(rng.rand(64, 64) < 0.5, 40.0, 200.0)
        img += rng.randn(64, 64) * 5
        # any t between the modes separates them; argmax lands on the FIRST
        # index of the between-class-variance plateau (OpenCV does the same)
        t = float(ef.otsu_threshold(jnp.asarray(img, jnp.float32)))
        assert 45 < t < 190, t


class TestCanny:
    def test_step_edge_detected_and_thin(self):
        img = np.zeros((64, 64), np.float32)
        img[:, 32:] = 200.0
        edge, gx, gy = ef.canny(jnp.asarray(img), 50.0, 100.0)
        e = np.asarray(edge)
        # one thin vertical line near col 31/32, nothing elsewhere
        cols = np.nonzero(e[16])[0]
        assert len(cols) >= 1 and np.all(np.abs(cols - 31.5) < 2), cols
        assert e[:, :28].sum() == 0 and e[:, 36:60].sum() == 0

    def test_hysteresis_extends_weak_chain(self):
        # gradient ramp: strong edge at center row fading to weak at the ends
        img = np.zeros((64, 64), np.float32)
        for r in range(64):
            amp = 200.0 if 28 <= r < 36 else 60.0
            img[r, 32:] = amp
        edge, _, _ = ef.canny(jnp.asarray(img), 30.0, 150.0)
        e = np.asarray(edge)
        assert e[32, 31] or e[32, 32]       # strong seed
        assert e[10, 31] or e[10, 32]       # weak pixels joined via chain


class TestComponents:
    def test_sizes(self):
        m = np.zeros((32, 32), bool)
        m[4, 2:12] = True          # 10-px line
        m[20:22, 20:23] = True     # 6-px blob
        s = np.asarray(ef.component_sizes(jnp.asarray(m)))
        assert s[4, 5] == 10
        assert s[20, 21] == 6
        assert s[0, 0] == 0

    def test_remove_small(self):
        m = np.zeros((32, 32), bool)
        m[4, 2:30] = True   # 28 px: kept
        m[20, 5:10] = True  # 5 px: dropped
        out = np.asarray(ef.remove_small_edges(jnp.asarray(m), min_size=20))
        assert out[4, 10] and not out[20, 7]


class TestRadialRemoval:
    def test_radial_streak_removed_tangential_kept(self):
        """A long edge pointing AT the focal point dies; a tangential edge of
        the same length survives (the IPM-artifact signature)."""
        H = W = 96
        fx, fy = 48, 48
        img = np.zeros((H, W), np.float32)
        # radial streak: along +x from the focal point (tangent aims at focal)
        img[46:50, 8:44] = 200.0
        # tangential arc: vertical bar far from focal, tangent perpendicular
        img[20:76, 80:84] = 200.0
        edge, gx, gy = ef.canny(jnp.asarray(img), 100.0, 300.0)
        vi = jnp.zeros((H, W), jnp.int32)
        focal = jnp.asarray([[fx, fy]], jnp.float32)
        out = np.asarray(ef.remove_radial_artifacts(
            edge, gx, gy, 15.0, vi, focal, min_len=20))
        e = np.asarray(edge)
        # the radial streak's long horizontal borders existed pre-filter and
        # are mostly deleted (NMS corner crumbs at the caps may survive)
        assert e[45, 20] or e[44, 20] or e[46, 20]
        pre = e[42:54, 10:42].sum()
        post = out[42:54, 10:42].sum()
        assert post < 0.2 * pre, (pre, post)
        # tangential bar survives
        assert out[30:66, 78:86].sum() > 20


class TestFullPipeline:
    def test_filter_and_odometer_path(self):
        from fishbirdeyevisualslam_tpu.config import SystemConfig
        from fishbirdeyevisualslam_tpu.slam.bird_odometer import (
            edge_cloud_filtered)
        rng = np.random.RandomState(0)
        cfg = SystemConfig()
        b = cfg.bird
        img = rng.rand(b.rows, b.cols).astype(np.float32) * 30 + 80
        img[100:104, 50:200] = 220.0   # a lane-marking-ish structure
        free = np.full((b.rows, b.cols), 255.0, np.float32)
        merged, bird_e, free_e = ef.filter_ipm_edges(
            jnp.asarray(img), jnp.asarray(free))
        assert np.asarray(bird_e).sum() > 0
        cloud = edge_cloud_filtered(jnp.asarray(img), jnp.asarray(free), cfg)
        assert bool(cloud.valid.any())
        assert np.isfinite(np.asarray(cloud.xy)).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
