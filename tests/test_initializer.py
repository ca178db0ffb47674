import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import DEFAULT_CONFIG
from fishbirdeyevisualslam_tpu.geometry import se3, camera
from fishbirdeyevisualslam_tpu.solvers import initializer

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier

CAM = DEFAULT_CONFIG.camera


def two_view_scene(n=300, baseline=(0.8, 0.05, 0.3), rot=(0.0, 0.03, 0.0),
                   seed=0, outlier_frac=0.05, noise=0.3):
    rng = np.random.RandomState(seed)
    X = np.stack([
        rng.uniform(-10, 10, n), rng.uniform(-5, 5, n), rng.uniform(8, 30, n)
    ], -1).astype(np.float32)
    Tcw1 = se3.identity()
    # camera 2: world-to-camera; true relative T21 = Tcw2 (since Tcw1 = I)
    T21_true = se3.make(
        se3.so3_exp_quat(jnp.asarray(rot, jnp.float32)),
        jnp.asarray(baseline, jnp.float32),
    )
    uv1 = np.array(camera.project_pinhole(CAM, se3.transform(Tcw1, jnp.asarray(X))))
    uv2 = np.array(camera.project_pinhole(CAM, se3.transform(T21_true, jnp.asarray(X))))
    uv1 += rng.randn(n, 2) * noise
    uv2 += rng.randn(n, 2) * noise
    n_out = int(n * outlier_frac)
    uv2[:n_out] = rng.uniform(0, 900, (n_out, 2))
    valid = np.ones(n, bool)
    return jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid), T21_true, n_out


class TestRansacF:
    def test_inliers_found(self):
        uv1, uv2, valid, T21, n_out = two_view_scene()
        F, score, inl = initializer.ransac_fundamental(uv1, uv2, valid, jax.random.PRNGKey(0))
        inl = np.asarray(inl)
        assert inl[n_out:].mean() > 0.9
        assert inl[:n_out].mean() < 0.2


class TestInitialize:
    def test_recovers_metric_pose(self):
        uv1, uv2, valid, T21_true, _ = two_view_scene()
        out = initializer.initialize(
            CAM, uv1, uv2, valid, T21_true, jax.random.PRNGKey(1)
        )
        assert bool(out.success)
        # translation recovered at METRIC scale (odometry dot product)
        t_est = np.asarray(out.T21[4:])
        t_true = np.asarray(T21_true[4:])
        np.testing.assert_allclose(t_est, t_true, atol=0.05)
        # rotation
        dq = se3.quat_mul(se3.quat_conj(out.T21[:4]), T21_true[:4])
        ang = 2 * np.arccos(min(1.0, abs(float(dq[0]))))
        assert ang < 0.01, ang
        assert int(out.n_good) > 200

    def test_triangulated_points_metric(self):
        uv1, uv2, valid, T21_true, _ = two_view_scene(seed=3)
        out = initializer.initialize(CAM, uv1, uv2, valid, T21_true, jax.random.PRNGKey(2))
        assert bool(out.success)
        tri = np.asarray(out.triangulated)
        Xw = np.asarray(out.Xw)
        assert tri.sum() > 150
        # depths must be in the metric range of the scene (8..30m)
        z = Xw[tri][:, 2]
        assert (z > 5).all() and (z < 60).all()  # depth noise grows ~z^2 for far points

    def test_fails_with_zero_baseline(self):
        rng = np.random.RandomState(5)
        n = 200
        uv1 = jnp.asarray(rng.uniform(50, 900, (n, 2)).astype(np.float32))
        uv2 = uv1 + jnp.asarray(rng.randn(n, 2).astype(np.float32) * 0.3)
        T21 = se3.identity()
        out = initializer.initialize(CAM, uv1, uv2, jnp.ones(n, bool), T21, jax.random.PRNGKey(3))
        assert not bool(out.success)

    def test_homography_branch_on_planar_scene(self):
        # all points on one tilted plane: F is degenerate, the H branch must
        # win model selection (RH > 0.4) and still recover the metric pose
        rng = np.random.RandomState(11)
        n = 300
        xy = np.stack([rng.uniform(-8, 8, n), rng.uniform(-4, 4, n)], -1)
        z = 14.0 + 0.35 * xy[:, 0] + 0.2 * xy[:, 1]
        X = np.concatenate([xy, z[:, None]], -1).astype(np.float32)
        T21_true = se3.make(
            se3.so3_exp_quat(jnp.asarray([0.0, 0.04, 0.01], jnp.float32)),
            jnp.asarray([0.9, 0.0, 0.25], jnp.float32),
        )
        uv1 = np.array(camera.project_pinhole(CAM, jnp.asarray(X)))
        uv2 = np.array(camera.project_pinhole(CAM, se3.transform(T21_true, jnp.asarray(X))))
        uv1 += rng.randn(n, 2) * 0.3
        uv2 += rng.randn(n, 2) * 0.3
        out = initializer.initialize(
            CAM, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(n, bool),
            T21_true, jax.random.PRNGKey(6))
        assert bool(out.success)
        np.testing.assert_allclose(
            np.asarray(out.T21[4:]), np.asarray(T21_true[4:]), atol=0.08)
        dq = se3.quat_mul(se3.quat_conj(out.T21[:4]), T21_true[:4])
        ang = 2 * np.arccos(min(1.0, abs(float(dq[0]))))
        assert ang < 0.02, ang

    def test_homography_decomposition_exact(self):
        # synthetic calibrated homography of a known plane/motion: one of the 8
        # Faugeras hypotheses must equal (R, t/d)
        K = np.array([[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1.0]], np.float32)
        Rt = np.asarray(se3.quat_to_matrix(
            se3.so3_exp_quat(jnp.asarray([0.02, -0.05, 0.01], jnp.float32))))
        t = np.array([0.4, 0.1, -0.2], np.float32)
        nrm = np.array([0.1, -0.05, 1.0], np.float32)
        nrm /= np.linalg.norm(nrm)
        d = 12.0
        A = Rt + np.outer(t / d, nrm)
        H = K @ A @ np.linalg.inv(K)
        Rs, ts, degen = initializer.decompose_H(jnp.asarray(H), jnp.asarray(K))
        assert not bool(degen)
        t_unit = t / np.linalg.norm(t)
        errs = [
            min(np.linalg.norm(np.asarray(ts[i]) - t_unit),
                np.linalg.norm(np.asarray(ts[i]) + t_unit))
            + np.abs(np.asarray(Rs[i]) - Rt).max()
            for i in range(8)
        ]
        assert min(errs) < 1e-3, errs

    def test_reinitialize_with_odometry_rotation(self):
        uv1, uv2, valid, T21_true, _ = two_view_scene(seed=7)
        out = initializer.reinitialize(CAM, uv1, uv2, valid, T21_true, jax.random.PRNGKey(4))
        assert bool(out.success)
        # direction comes from the (noisy) essential matrix; odometry fixes only
        # rotation and scale — allow a few-percent direction error
        np.testing.assert_allclose(np.asarray(out.T21[4:]), np.asarray(T21_true[4:]), atol=0.12)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
