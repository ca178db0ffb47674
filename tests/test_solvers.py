import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import DEFAULT_CONFIG
from fishbirdeyevisualslam_tpu.geometry import se3, camera
from fishbirdeyevisualslam_tpu.solvers import residuals as res
from fishbirdeyevisualslam_tpu.solvers.pose_opt import (
    FrontObs, BirdObs, pose_optimization, bird_only_optimization,
)
from fishbirdeyevisualslam_tpu.solvers.triangulate import triangulate

CAM = DEFAULT_CONFIG.camera
BA = DEFAULT_CONFIG.ba
KEY = jax.random.PRNGKey(42)


def make_scene(n=200, seed=0):
    rng = np.random.RandomState(seed)
    Xw = np.stack([
        rng.uniform(-10, 10, n),
        rng.uniform(-5, 5, n),
        rng.uniform(8, 40, n),
    ], axis=-1).astype(np.float32)
    return jnp.asarray(Xw)


def project_all(Tcw, Xw):
    return camera.project_pinhole(CAM, se3.transform(Tcw, Xw))


class TestResiduals:
    def test_front_jacobian_vs_autodiff(self):
        Tcw = se3.random_pose(KEY, 0.2, 0.5)
        Xw = make_scene(5)
        uv = project_all(Tcw, Xw) + 1.0

        def f(xi):
            e, _, _ = res.front_residuals(CAM, se3.retract(Tcw, xi), Xw, uv)
            return e

        J_auto = jax.jacobian(f)(jnp.zeros(6))  # (5, 2, 6)
        _, J_manual, _ = res.front_residuals(CAM, Tcw, Xw, uv)
        np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_manual), atol=1e-3)

    def test_bird_jacobian_vs_autodiff(self):
        Tcw = se3.random_pose(KEY, 0.2, 0.5)
        Xw = make_scene(4)
        Xc = se3.transform(Tcw, Xw) + 0.01

        def f(xi):
            e, _, _ = res.bird_residuals(se3.retract(Tcw, xi), Xw, Xc)
            return e

        J_auto = jax.jacobian(f)(jnp.zeros(6))
        _, J_manual, _ = res.bird_residuals(Tcw, Xw, Xc)
        np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_manual), atol=1e-4)

    def test_odom_jacobians_vs_autodiff(self):
        T1 = se3.random_pose(jax.random.fold_in(KEY, 1), 0.3, 1.0)
        T2 = se3.random_pose(jax.random.fold_in(KEY, 2), 0.3, 1.0)
        # measurement close to actual so e is small (JRInv approx is first-order)
        meas = se3.compose(T1, se3.inverse(T2))
        meas = se3.compose(se3.exp(0.01 * jnp.ones(6)), meas)

        def f1(xi):
            e, _, _ = res.odom_residuals(meas, se3.retract(T1, xi), T2)
            return e

        def f2(xi):
            e, _, _ = res.odom_residuals(meas, T1, se3.retract(T2, xi))
            return e

        _, J1, J2 = res.odom_residuals(meas, T1, T2)
        J1a = jax.jacobian(f1)(jnp.zeros(6))
        J2a = jax.jacobian(f2)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(J1a), np.asarray(J1), atol=0.05)
        np.testing.assert_allclose(np.asarray(J2a), np.asarray(J2), atol=0.05)

    def test_front_point_jacobian(self):
        Tcw = se3.random_pose(KEY, 0.2, 0.5)
        Xw = make_scene(3)
        uv = project_all(Tcw, Xw)

        def f(X):
            e, _, _ = res.front_residuals(CAM, Tcw, X[None], uv[:1])
            return e[0]

        Ja = jax.jacobian(f)(Xw[0])
        Jm = res.front_point_jacobian(CAM, Tcw, Xw[:1])[0]
        np.testing.assert_allclose(np.asarray(Ja), np.asarray(Jm), atol=1e-3)


class TestPoseOptimization:
    def _obs(self, Tcw_true, n=200, noise=0.5, outlier_frac=0.1, seed=3):
        rng = np.random.RandomState(seed)
        Xw = make_scene(n, seed)
        uv = np.array(project_all(Tcw_true, Xw))
        uv += rng.randn(n, 2) * noise
        n_out = int(n * outlier_frac)
        uv[:n_out] += rng.uniform(20, 80, (n_out, 2))  # gross outliers
        return FrontObs(
            Xw=Xw,
            uv=jnp.asarray(uv.astype(np.float32)),
            inv_sigma2=jnp.ones(n),
            valid=jnp.ones(n, bool),
        ), n_out

    def test_converges_from_perturbed_pose(self):
        Tcw_true = se3.random_pose(KEY, 0.1, 1.0)
        front, n_out = self._obs(Tcw_true)
        bird = BirdObs(jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.ones(1), jnp.zeros(1, bool))
        Tcw0 = se3.retract(Tcw_true, jnp.array([0.02, -0.02, 0.01, 0.2, -0.1, 0.15]))
        out = pose_optimization(CAM, BA, Tcw0, front, bird)
        err = np.abs(np.asarray(se3.log(se3.compose(out.Tcw, se3.inverse(Tcw_true)))))
        assert err.max() < 2e-2, err  # noise-limited (0.5 px on 200 pts)
        # outliers flagged
        fi = np.asarray(out.front_inlier)
        assert not fi[:n_out].any()
        assert fi[n_out:].mean() > 0.9

    def test_with_bird_constraints(self):
        Tcw_true = se3.random_pose(jax.random.fold_in(KEY, 9), 0.1, 1.0)
        rng = np.random.RandomState(5)
        nb = 100
        Xw_b = jnp.asarray(np.stack([
            rng.uniform(2, 15, nb), rng.uniform(-5, 5, nb), np.zeros(nb)
        ], -1).astype(np.float32))
        Xc = se3.transform(Tcw_true, Xw_b) + jnp.asarray(rng.randn(nb, 3).astype(np.float32) * 0.01)
        bird = BirdObs(Xw_b, Xc, jnp.ones(nb), jnp.ones(nb, bool))
        front, _ = self._obs(Tcw_true, n=50, noise=0.5, outlier_frac=0.0)
        Tcw0 = se3.retract(Tcw_true, jnp.array([0.01, 0.01, -0.01, 0.1, 0.1, -0.1]))
        out = pose_optimization(CAM, BA, Tcw0, front, bird)
        err = np.abs(np.asarray(se3.log(se3.compose(out.Tcw, se3.inverse(Tcw_true)))))
        assert err.max() < 2e-2, err
        assert int(out.bird_inlier.sum()) > 90

    def test_bird_only(self):
        Tcw_true = se3.random_pose(jax.random.fold_in(KEY, 11), 0.1, 1.0)
        rng = np.random.RandomState(6)
        nb = 80
        Xw_b = jnp.asarray(np.stack([
            rng.uniform(2, 15, nb), rng.uniform(-5, 5, nb), np.zeros(nb)
        ], -1).astype(np.float32))
        Xc = se3.transform(Tcw_true, Xw_b)
        bird = BirdObs(Xw_b, Xc, jnp.ones(nb), jnp.ones(nb, bool))
        Tcw0 = se3.retract(Tcw_true, jnp.array([0.02, 0.0, -0.02, 0.2, -0.2, 0.1]))
        out = bird_only_optimization(BA, Tcw0, bird)
        err = np.abs(np.asarray(se3.log(se3.compose(out.Tcw, se3.inverse(Tcw_true)))))
        assert err.max() < 1e-3, err

    def test_too_few_points_returns_initial(self):
        front = FrontObs(jnp.zeros((5, 3)), jnp.zeros((5, 2)), jnp.ones(5), jnp.zeros(5, bool))
        bird = BirdObs(jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.ones(1), jnp.zeros(1, bool))
        T0 = se3.random_pose(KEY)
        out = pose_optimization(CAM, BA, T0, front, bird)
        np.testing.assert_allclose(np.asarray(out.Tcw), np.asarray(T0))
        assert int(out.n_inliers) == 0

    def test_jit_compatible(self):
        Tcw_true = se3.random_pose(KEY, 0.1, 1.0)
        front, _ = self._obs(Tcw_true, n=64)
        bird = BirdObs(jnp.zeros((8, 3)), jnp.zeros((8, 3)), jnp.ones(8), jnp.zeros(8, bool))
        f = jax.jit(lambda T, fr, bi: pose_optimization(CAM, BA, T, fr, bi))
        out = f(Tcw_true, front, bird)
        out2 = f(out.Tcw, front, bird)
        assert np.isfinite(np.asarray(out2.Tcw)).all()


class TestTriangulate:
    def test_recovers_points(self):
        Tcw1 = se3.identity()
        Tcw2 = se3.make(jnp.array([1.0, 0, 0, 0]), jnp.array([-2.0, 0.0, 0.0]))  # baseline 2m
        Xw = make_scene(100, seed=8)
        uv1 = project_all(Tcw1, Xw)
        uv2 = project_all(Tcw2, Xw)
        out = triangulate(CAM, Tcw1, Tcw2, uv1, uv2)
        v = np.asarray(out.valid)
        assert v.mean() > 0.9, v.mean()
        np.testing.assert_allclose(np.asarray(out.Xw)[v], np.asarray(Xw)[v], atol=0.05)

    def test_rejects_zero_baseline(self):
        Tcw1 = se3.identity()
        Xw = make_scene(50, seed=9)
        uv1 = project_all(Tcw1, Xw)
        out = triangulate(CAM, Tcw1, Tcw1, uv1, uv1)
        assert not bool(out.valid.any())  # no parallax

    def test_rejects_behind_camera(self):
        Tcw1 = se3.identity()
        Tcw2 = se3.make(jnp.array([1.0, 0, 0, 0]), jnp.array([-2.0, 0.0, 0.0]))
        Xw = make_scene(20, seed=10).at[:, 2].set(-20.0)  # behind
        uv1 = project_all(Tcw1, Xw)
        uv2 = project_all(Tcw2, Xw)
        out = triangulate(CAM, Tcw1, Tcw2, uv1, uv2)
        assert not bool(out.valid.any())


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
