"""Parity tests: fused Pallas pose-LM kernel vs the jnp reference implementation.

Run in Pallas interpret mode on the CPU test mesh; the driver's TPU bench runs
the compiled kernel.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3, camera as cam_ops
from fishbirdeyevisualslam_tpu.solvers.pose_opt import (
    FrontObs, BirdObs, pose_optimization,
)
from fishbirdeyevisualslam_tpu.solvers.pallas_pose_opt import pose_optimization_fused

CFG = SystemConfig()


def make_problem(n=300, nb=80, seed=0, outlier_frac=0.1, noise=0.5):
    rng = np.random.RandomState(seed)
    Xw = np.stack([
        rng.uniform(-8, 8, n), rng.uniform(-4, 4, n), rng.uniform(8, 30, n)
    ], -1).astype(np.float32)
    Tcw_true = se3.exp(jnp.asarray([0.02, -0.01, 0.03, 0.3, -0.1, 0.2], jnp.float32))
    uv = np.array(cam_ops.project_pinhole(CFG.camera, se3.transform(Tcw_true, jnp.asarray(Xw))))
    uv += rng.randn(n, 2).astype(np.float32) * noise
    n_out = int(outlier_frac * n)
    uv[:n_out] += rng.uniform(30, 80, (n_out, 2)).astype(np.float32)
    front = FrontObs(Xw=jnp.asarray(Xw), uv=jnp.asarray(uv),
                     inv_sigma2=jnp.ones(n), valid=jnp.ones(n, bool))
    Xb = np.stack([
        rng.uniform(2, 12, nb), rng.uniform(-5, 5, nb), np.zeros(nb)
    ], -1).astype(np.float32)
    Xc = np.array(se3.transform(Tcw_true, jnp.asarray(Xb)))
    Xc += rng.randn(nb, 3).astype(np.float32) * 0.01
    bird = BirdObs(Xw=jnp.asarray(Xb), Xc=jnp.asarray(Xc),
                   inv_sigma2=jnp.ones(nb), valid=jnp.ones(nb, bool))
    return Tcw_true, front, bird


class TestFusedPoseOpt:
    def test_matches_reference_impl(self):
        Tcw_true, front, bird = make_problem()
        T0 = se3.identity()
        ref = pose_optimization(CFG.camera, CFG.ba, T0, front, bird)
        fused = pose_optimization_fused(CFG.camera, CFG.ba, T0, front, bird,
                                        interpret=True)
        # both must land on the true pose
        for out in (ref, fused):
            err = np.abs(np.asarray(se3.log(se3.compose(out.Tcw, se3.inverse(Tcw_true)))))
            assert err.max() < 5e-3, err
        # pose agreement between the two implementations
        d = np.abs(np.asarray(se3.log(se3.compose(fused.Tcw, se3.inverse(ref.Tcw)))))
        assert d.max() < 1e-3, d
        # inlier classification agreement (allow a few borderline flips)
        f_ref = np.asarray(ref.front_inlier)
        f_fused = np.asarray(fused.front_inlier)
        assert (f_ref != f_fused).mean() < 0.02
        assert abs(int(ref.n_inliers) - int(fused.n_inliers)) <= 5

    def test_with_prior(self):
        Tcw_true, front, bird = make_problem(seed=3)
        T0 = se3.retract(Tcw_true, jnp.asarray([0.01, 0, -0.01, 0.05, 0.02, 0], jnp.float32))
        ref = pose_optimization(CFG.camera, CFG.ba, T0, front, bird,
                                prior_T=T0, prior_info=100.0)
        fused = pose_optimization_fused(CFG.camera, CFG.ba, T0, front, bird,
                                        prior_T=T0, prior_info=100.0, interpret=True)
        d = np.abs(np.asarray(se3.log(se3.compose(fused.Tcw, se3.inverse(ref.Tcw)))))
        assert d.max() < 2e-3, d

    def test_bird_only_observations(self):
        # front starved (3 valid points is the minimum the solver accepts)
        Tcw_true, front, bird = make_problem(n=16, nb=200, outlier_frac=0.0, seed=5)
        valid = jnp.zeros(16, bool).at[:4].set(True)
        front = front._replace(valid=valid)
        T0 = se3.identity()
        ref = pose_optimization(CFG.camera, CFG.ba, T0, front, bird)
        fused = pose_optimization_fused(CFG.camera, CFG.ba, T0, front, bird,
                                        interpret=True)
        d = np.abs(np.asarray(se3.log(se3.compose(fused.Tcw, se3.inverse(ref.Tcw)))))
        assert d.max() < 2e-3, d

    def test_too_few_returns_seed(self):
        _, front, bird = make_problem(n=8, nb=8, outlier_frac=0.0)
        front = front._replace(valid=jnp.zeros(8, bool).at[:2].set(True))
        T0 = se3.exp(jnp.asarray([0, 0, 0.1, 1.0, 0, 0], jnp.float32))
        fused = pose_optimization_fused(CFG.camera, CFG.ba, T0, front, bird._replace(
            valid=jnp.zeros(8, bool)), interpret=True)
        np.testing.assert_allclose(np.asarray(fused.Tcw), np.asarray(T0), atol=1e-7)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
