"""Distributed BA on the virtual 8-device CPU mesh: correctness vs single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.solvers.ba import bundle_adjust
from fishbirdeyevisualslam_tpu.parallel.sharded_ba import (
    make_mesh, distributed_bundle_adjust, batched_pose_optimization,
)
from fishbirdeyevisualslam_tpu.solvers.pose_opt import FrontObs, BirdObs

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_ba import build_problem, CAM, BA  # noqa: E402

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier

CFG = SystemConfig()


class TestDistributedBA:
    def test_matches_single_device(self):
        poses_true, poses0, fixed, front, bird, odom, _, _ = build_problem(
            K=4, P=32, PB=8, M=3)
        ref = bundle_adjust(CAM, BA, poses0, fixed, front, bird, odom,
                            n_iters_1=2, n_iters_2=1)
        mesh = make_mesh(n_pt=4, n_dp=1)
        out = distributed_bundle_adjust(CFG, mesh, poses0, fixed, front, bird, odom,
                                        n_iters_1=2, n_iters_2=1)
        np.testing.assert_allclose(
            np.asarray(out.poses), np.asarray(ref.poses), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out.front_Xw[:32]), np.asarray(ref.front_Xw), atol=2e-3)

    def test_8_way(self):
        poses_true, poses0, fixed, front, bird, odom, _, _ = build_problem(
            K=4, P=32, PB=8, M=3)
        mesh = make_mesh(n_pt=8, n_dp=1)
        out = distributed_bundle_adjust(CFG, mesh, poses0, fixed, front, bird, odom,
                                        n_iters_1=2, n_iters_2=1)
        assert np.isfinite(np.asarray(out.poses)).all()
        # poses actually improve
        err0 = np.abs(np.asarray(jax.vmap(se3.log)(
            jax.vmap(se3.compose)(poses0, jax.vmap(se3.inverse)(poses_true))))).max()
        err1 = np.abs(np.asarray(jax.vmap(se3.log)(
            jax.vmap(se3.compose)(out.poses, jax.vmap(se3.inverse)(poses_true))))).max()
        assert err1 < err0

    def test_dp_pose_opt(self):
        rng = np.random.RandomState(0)
        B, n, nb = 8, 32, 8
        mesh = make_mesh(n_pt=1, n_dp=8)
        from fishbirdeyevisualslam_tpu.geometry import camera
        Xw = jnp.asarray(rng.uniform(-5, 5, (B, n, 3)).astype(np.float32)
                         + np.array([0, 0, 15], np.float32))
        uv = camera.project_pinhole(CFG.camera, Xw)
        front = FrontObs(Xw=Xw, uv=uv, inv_sigma2=jnp.ones((B, n)),
                         valid=jnp.ones((B, n), bool))
        Xb = jnp.asarray(rng.uniform(2, 10, (B, nb, 3)).astype(np.float32)
                         * np.array([1, 1, 0], np.float32))
        bird = BirdObs(Xw=Xb, Xc=Xb, inv_sigma2=jnp.ones((B, nb)),
                       valid=jnp.ones((B, nb), bool))
        T0 = jnp.tile(se3.identity()[None], (B, 1))
        with mesh:
            out = batched_pose_optimization(CFG, mesh, T0, front, bird)
        assert np.isfinite(np.asarray(out.Tcw)).all()
        assert out.Tcw.shape == (B, 7)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
