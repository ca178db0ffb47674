import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import DEFAULT_CONFIG
from fishbirdeyevisualslam_tpu.geometry import se3, camera
from fishbirdeyevisualslam_tpu.solvers.ba import (
    PointBlocks, OdomEdges, bundle_adjust,
)

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier

CAM = DEFAULT_CONFIG.camera
BA = DEFAULT_CONFIG.ba


def build_problem(K=6, P=120, PB=40, M=4, noise_px=0.3, noise_b=0.005, seed=0,
                  pose_noise=0.02):
    """Synthetic BA problem: K cameras on a line, P front points, PB ground points,
    every point observed by M consecutive cameras."""
    rng = np.random.RandomState(seed)
    # ground-truth camera poses: moving along +z (camera looks along +z)
    poses_true = []
    for k in range(K):
        # dominant lateral motion: good parallax for depth observability
        Twc_t = np.array([1.0 * k, -0.01 * k, 0.4 * k], np.float32)
        q = np.array([1.0, 0, 0, 0], np.float32)
        Twc = jnp.concatenate([jnp.asarray(q), jnp.asarray(Twc_t)])
        poses_true.append(se3.inverse(Twc))
    poses_true = jnp.stack(poses_true)

    # depth <= 22m keeps triangulation sigma_z (~ z^2 sigma_px / (f B)) well below
    # the 0.2m initial perturbation, so BA measurably reduces point error
    Xw = np.stack([
        rng.uniform(-8, 8, P), rng.uniform(-4, 4, P), rng.uniform(12, 22, P)
    ], -1).astype(np.float32)
    Xw_b = np.stack([
        rng.uniform(-8, 8, PB), rng.uniform(-4, 4, PB), rng.uniform(10, 30, PB)
    ], -1).astype(np.float32)

    def obs_blocks(X, n, dim):
        kf_idx = np.zeros((n, M), np.int32)
        meas = np.zeros((n, M, dim), np.float32)
        valid = np.zeros((n, M), bool)
        for p in range(n):
            start = rng.randint(0, K - M + 1)
            for m in range(M):
                k = start + m
                kf_idx[p, m] = k
                pc = np.asarray(se3.transform(poses_true[k], jnp.asarray(X[p])))
                if dim == 2:
                    uv = np.asarray(camera.project_pinhole(CAM, jnp.asarray(pc)))
                    meas[p, m] = uv + rng.randn(2) * noise_px
                    valid[p, m] = 0 < pc[2] and 0 <= uv[0] < 2000 and 0 <= uv[1] < 2000
                else:
                    meas[p, m] = pc + rng.randn(3) * noise_b
                    valid[p, m] = True
        return PointBlocks(
            Xw=jnp.asarray(X + rng.randn(*X.shape).astype(np.float32) * 0.2),
            kf_idx=jnp.asarray(kf_idx),
            meas=jnp.asarray(meas),
            inv_sigma2=jnp.ones((n, M)),
            valid=jnp.asarray(valid),
            point_valid=jnp.ones(n, bool),
        )

    front = obs_blocks(Xw, P, 2)
    bird = obs_blocks(Xw_b, PB, 3)

    # odometry chain edges with true relative poses
    ii = np.arange(K - 1, dtype=np.int32)
    jj = ii + 1
    T_meas = jax.vmap(lambda a, b: se3.compose(poses_true[a], se3.inverse(poses_true[b])))(ii, jj)
    odom = OdomEdges(jnp.asarray(ii), jnp.asarray(jj), T_meas,
                     jnp.full(K - 1, 1e4), jnp.ones(K - 1, bool))

    # perturb poses (keep first fixed as gauge)
    rngk = jax.random.PRNGKey(seed)
    xi = pose_noise * jax.random.normal(rngk, (K, 6))
    xi = xi.at[0].set(0.0)
    poses0 = se3.retract(poses_true, xi)
    fixed = jnp.zeros(K, bool).at[0].set(True)
    return poses_true, poses0, fixed, front, bird, odom, jnp.asarray(Xw), jnp.asarray(Xw_b)


class TestBundleAdjust:
    def test_reduces_pose_error(self):
        poses_true, poses0, fixed, front, bird, odom, Xw, Xw_b = build_problem()
        out = bundle_adjust(CAM, BA, poses0, fixed, front, bird, odom)
        err0 = np.abs(np.asarray(jax.vmap(se3.log)(
            jax.vmap(se3.compose)(poses0, jax.vmap(se3.inverse)(poses_true))))).max()
        err1 = np.abs(np.asarray(jax.vmap(se3.log)(
            jax.vmap(se3.compose)(out.poses, jax.vmap(se3.inverse)(poses_true))))).max()
        assert err1 < err0 * 0.2, (err0, err1)
        assert err1 < 0.01, err1

    def test_reduces_point_error(self):
        poses_true, poses0, fixed, front, bird, odom, Xw, Xw_b = build_problem()
        out = bundle_adjust(CAM, BA, poses0, fixed, front, bird, odom)
        perr0 = np.abs(np.asarray(front.Xw - Xw)).mean()
        perr1 = np.abs(np.asarray(out.front_Xw - Xw)).mean()
        assert perr1 < perr0 * 0.5, (perr0, perr1)
        berr1 = np.abs(np.asarray(out.bird_Xw - Xw_b)).mean()
        assert berr1 < 0.05, berr1

    def test_outlier_classification(self):
        poses_true, poses0, fixed, front, bird, odom, Xw, Xw_b = build_problem()
        # corrupt some front measurements
        meas = np.array(front.meas)
        meas[:10, 0] += 60.0
        front = front._replace(meas=jnp.asarray(meas))
        out = bundle_adjust(CAM, BA, poses0, fixed, front, bird, odom)
        fi = np.asarray(out.front_inlier)
        assert not fi[:10, 0].any()
        assert fi[10:].mean() > 0.9

    def test_fixed_pose_untouched(self):
        poses_true, poses0, fixed, front, bird, odom, _, _ = build_problem()
        out = bundle_adjust(CAM, BA, poses0, fixed, front, bird, odom)
        np.testing.assert_allclose(np.asarray(out.poses[0]), np.asarray(poses0[0]), atol=1e-7)

    def test_odometry_edges_constrain_scale(self):
        # without front/bird obs at all, odometry chain alone should pull poses
        # toward the measured relative transforms
        poses_true, poses0, fixed, front, bird, odom, _, _ = build_problem(pose_noise=0.05)
        front = front._replace(valid=jnp.zeros_like(front.valid))
        bird = bird._replace(valid=jnp.zeros_like(bird.valid))
        out = bundle_adjust(CAM, BA, poses0, fixed, front, bird, odom)
        for k in range(1, 6):
            rel = se3.compose(out.poses[k - 1], se3.inverse(out.poses[k]))
            e = np.abs(np.asarray(se3.log(se3.compose(se3.inverse(odom.T_meas[k - 1]), rel))))
            assert e.max() < 1e-3, (k, e)

    def test_jit(self):
        poses_true, poses0, fixed, front, bird, odom, _, _ = build_problem(K=4, P=40, PB=10)
        f = jax.jit(lambda p0, fr, bi, od: bundle_adjust(CAM, BA, p0, fixed, fr, bi, od))
        out = f(poses0, front, bird, odom)
        assert np.isfinite(np.asarray(out.poses)).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
