import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import DEFAULT_CONFIG
from fishbirdeyevisualslam_tpu.geometry import se3, sim3, camera, ipm, odometry


KEY = jax.random.PRNGKey(0)


def rand_pose(i, sr=1.0, st=2.0):
    return se3.random_pose(jax.random.fold_in(KEY, i), sr, st)


class TestSE3:
    def test_compose_inverse(self):
        T1, T2 = rand_pose(1), rand_pose(2)
        T = se3.compose(T1, T2)
        I = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(np.asarray(I), np.asarray(se3.identity()), atol=1e-5)

    def test_matrix_roundtrip(self):
        T = rand_pose(3)
        M = se3.to_matrix(T)
        T2 = se3.from_matrix(M)
        # quaternion sign ambiguity: compare matrices
        np.testing.assert_allclose(np.asarray(se3.to_matrix(T2)), np.asarray(M), atol=1e-5)

    def test_transform_matches_matrix(self):
        T = rand_pose(4)
        p = jax.random.normal(jax.random.fold_in(KEY, 5), (10, 3))
        out = se3.transform(T, p)
        M = np.asarray(se3.to_matrix(T))
        expect = (M[:3, :3] @ np.asarray(p).T).T + M[:3, 3]
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_exp_log_roundtrip(self):
        xi = 0.5 * jax.random.normal(jax.random.fold_in(KEY, 6), (8, 6))
        back = se3.log(se3.exp(xi))
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-4)

    def test_exp_small_angle(self):
        xi = jnp.array([1e-9, -1e-9, 1e-9, 0.1, 0.2, 0.3])
        T = se3.exp(xi)
        np.testing.assert_allclose(np.asarray(T[4:]), [0.1, 0.2, 0.3], atol=1e-6)
        assert np.isfinite(np.asarray(T)).all()

    def test_retract_left_multiplicative(self):
        # point Jacobian spec: d(T x)/d xi = [-[p]x | I] with p = T x
        # (reference src/OdomG2oTypeQuat.cc:41-50)
        T = rand_pose(7)
        x = jnp.array([0.3, -0.2, 1.5])

        def f(xi):
            return se3.transform(se3.retract(T, xi), x)

        J = jax.jacobian(f)(jnp.zeros(6))
        p = se3.transform(T, x)
        J_expected = jnp.concatenate([-se3.skew(p), jnp.eye(3)], axis=-1)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_expected), atol=1e-4)

    def test_relative_error_zero_at_measurement(self):
        T1, T2 = rand_pose(8), rand_pose(9)
        meas = se3.compose(T1, se3.inverse(T2))
        e = se3.relative_error(meas, T1, T2)
        np.testing.assert_allclose(np.asarray(e), np.zeros(6), atol=1e-5)

    def test_batched(self):
        Ts = jnp.stack([rand_pose(i) for i in range(10, 14)])
        out = se3.compose(Ts, se3.inverse(Ts))
        np.testing.assert_allclose(
            np.asarray(out), np.tile(np.asarray(se3.identity()), (4, 1)), atol=1e-5
        )


class TestSim3:
    def test_compose_inverse(self):
        S = sim3.from_se3(rand_pose(20), jnp.array([1.7]))
        I = sim3.compose(S, sim3.inverse(S))
        np.testing.assert_allclose(np.asarray(I[:4]), [1, 0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(I[4:7]), np.zeros(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I[7]), 1.0, atol=1e-5)

    def test_transform_scale(self):
        S = sim3.from_se3(se3.identity(), jnp.array([2.0]))
        p = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(sim3.transform(S, p)), [2, 4, 6], atol=1e-6)

    def test_exp_log(self):
        v = 0.3 * jax.random.normal(jax.random.fold_in(KEY, 21), (7,))
        np.testing.assert_allclose(np.asarray(sim3.log(sim3.exp(v))), np.asarray(v), atol=1e-4)


class TestCamera:
    def test_undistort_roundtrip(self):
        cam = DEFAULT_CONFIG.camera
        uv = jnp.array([[100.0, 80.0], [480.0, 302.0], [700.0, 350.0], [20.0, 380.0]])
        und = camera.undistort_fisheye(cam, uv)
        back = camera.distort_fisheye(cam, und)
        np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-2)

    def test_project_backproject(self):
        cam = DEFAULT_CONFIG.camera
        xyz = jnp.array([[0.5, -0.2, 4.0], [1.0, 1.0, 10.0]])
        uv = camera.project_pinhole(cam, xyz)
        xyz2 = camera.backproject_pinhole(cam, uv, xyz[..., 2])
        np.testing.assert_allclose(np.asarray(xyz2), np.asarray(xyz), atol=1e-4)


class TestIPM:
    def test_pixel_base_roundtrip(self):
        cfg = DEFAULT_CONFIG.bird
        pix = jnp.array([[10.0, 20.0], [192.0, 192.0], [300.0, 50.0]])
        p = ipm.bird_pixel_to_base_xy(cfg, pix)
        # note pixel2meter * meter2pixel = 0.03984*25.1 ≈ 0.99998 (not exactly 1,
        # faithful to the reference constants)
        back = ipm.base_xy_to_bird_pixel(cfg, p)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pix), atol=0.05)
        np.testing.assert_allclose(np.asarray(p[..., 2]), 0.0)

    def test_center_pixel(self):
        cfg = DEFAULT_CONFIG.bird
        p = ipm.bird_pixel_to_base_xy(cfg, jnp.array([cfg.cols / 2.0, cfg.rows / 2.0]))
        np.testing.assert_allclose(np.asarray(p), [cfg.rear_axle_to_center, 0, 0], atol=1e-6)

    def test_extrinsics_consistency(self):
        ext = DEFAULT_CONFIG.extrinsics
        Tbc = ipm.extrinsics_Tbc(ext)
        Tcb = ipm.extrinsics_Tcb(ext)
        I = se3.compose(Tbc, Tcb)
        np.testing.assert_allclose(np.asarray(I), np.asarray(se3.identity()), atol=1e-5)

    def test_cam_base_roundtrip(self):
        ext = DEFAULT_CONFIG.extrinsics
        p = jnp.array([[3.0, 0.5, 0.0], [8.0, -2.0, 0.0]])
        pc = ipm.base_xyz_to_cam(ext, p)
        back = ipm.cam_xyz_to_base(ext, pc)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-4)

    def test_ground_in_front_of_camera(self):
        # a ground point ahead of the vehicle must have positive depth in camera frame
        ext = DEFAULT_CONFIG.extrinsics
        pc = ipm.base_xyz_to_cam(ext, jnp.array([10.0, 0.0, 0.0]))
        assert float(pc[2]) > 0


class TestOdometry:
    def test_preintegrate_identity(self):
        o = jnp.array([3.0, 1.0, 0.4])
        T = odometry.preintegrate_base(o, o)
        np.testing.assert_allclose(np.asarray(T), np.asarray(se3.identity()), atol=1e-6)

    def test_preintegrate_straight(self):
        o1 = jnp.array([0.0, 0.0, 0.0])
        o2 = jnp.array([2.0, 0.0, 0.0])
        T = odometry.preintegrate_base(o1, o2)
        np.testing.assert_allclose(np.asarray(T[4:]), [2, 0, 0], atol=1e-6)

    def test_preintegrate_invariance(self):
        # relative motion must be invariant to the global frame of the odometer
        o1 = jnp.array([1.0, 2.0, 0.3])
        o2 = jnp.array([1.5, 2.7, 0.5])
        shift = jnp.array([5.0, -3.0, 1.2])

        def shifted(o):
            c, s = jnp.cos(shift[2]), jnp.sin(shift[2])
            x = c * o[0] - s * o[1] + shift[0]
            y = s * o[0] + c * o[1] + shift[1]
            return jnp.stack([x, y, o[2] + shift[2]])

        T_a = odometry.preintegrate_base(o1, o2)
        T_b = odometry.preintegrate_base(shifted(o1), shifted(o2))
        np.testing.assert_allclose(np.asarray(T_a), np.asarray(T_b), atol=1e-5)

    def test_consistency_with_se2_poses(self):
        o1 = jnp.array([1.0, 2.0, 0.3])
        o2 = jnp.array([1.5, 2.7, 0.5])
        T1 = odometry.se2_to_se3(o1)
        T2 = odometry.se2_to_se3(o2)
        T12 = odometry.preintegrate_base(o1, o2)
        np.testing.assert_allclose(
            np.asarray(se3.compose(T1, T12)), np.asarray(T2), atol=1e-5
        )

    def test_motion_prior(self):
        ext = DEFAULT_CONFIG.extrinsics
        o1 = jnp.array([0.0, 0.0, 0.0])
        o2 = jnp.array([1.0, 0.2, 0.05])
        Twb1 = odometry.se2_to_se3(o1)
        Twb2 = odometry.se2_to_se3(o2)
        Tcw1 = ipm.Tcw_from_Twb(ext, Twb1)
        Tcw2_expected = ipm.Tcw_from_Twb(ext, Twb2)
        Tcw2 = odometry.motion_prior_Tcw(ext, Tcw1, o1, o2)
        np.testing.assert_allclose(np.asarray(Tcw2), np.asarray(Tcw2_expected), atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
