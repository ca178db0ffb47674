"""Distributed bundle adjustment over a device mesh.

The reference has no distributed computing (threads + mutexes only, SURVEY.md
§2.3); this module is the new capability its design implies at scale: global BA
whose landmark blocks are sharded across devices, with the reduced camera
system psum-combined over ICI (SURVEY.md §7 step 7, BASELINE.json north star).

Sharding layout (the "how to scale your model" recipe — mesh, shardings, let
XLA insert collectives):

  axis ``pt``   — landmark blocks (front + bird PointBlocks leading axis).
                  Residuals, Jacobians, point marginalization, and landmark
                  back-substitution are embarrassingly parallel over this axis.
  axis ``dp``   — independent problems (frame batches / sequences) for
                  throughput benchmarking.

Inside ``bundle_adjust`` (see ``solvers/ba.py``) the per-shard (K,K,6,6) reduced
Hessian contribution and gradient are ``psum``'d over ``pt``; the 6Kx6K dense
solve is replicated (K is a few hundred at most — replicating a microsecond
Cholesky beats sharding it).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.solvers.ba import (
    PointBlocks, OdomEdges, BAResult, bundle_adjust,
)
from fishbirdeyevisualslam_tpu.solvers.pose_opt import (
    FrontObs, BirdObs, pose_optimization,
)


def make_mesh(n_pt: Optional[int] = None, n_dp: int = 1) -> Mesh:
    devs = np.asarray(jax.devices())
    if n_pt is not None and len(devs) < n_dp * n_pt:
        # not enough devices on the default backend (e.g. one real TPU chip):
        # fall back to the host CPU backend, which honors
        # --xla_force_host_platform_device_count for virtual-mesh validation
        devs = np.asarray(jax.devices("cpu"))
    if n_pt is None:
        n_pt = len(devs) // n_dp
    return Mesh(devs[: n_dp * n_pt].reshape(n_dp, n_pt), ("dp", "pt"))


def pad_blocks_to(blocks: PointBlocks, P_pad: int) -> PointBlocks:
    """Pad the landmark axis to a multiple suitable for even sharding."""
    P0 = blocks.Xw.shape[0]
    if P0 == P_pad:
        return blocks
    pad = P_pad - P0
    def zpad(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return PointBlocks(
        Xw=zpad(blocks.Xw), kf_idx=zpad(blocks.kf_idx), meas=zpad(blocks.meas),
        inv_sigma2=zpad(blocks.inv_sigma2),
        valid=zpad(blocks.valid), point_valid=zpad(blocks.point_valid),
    )


def distributed_bundle_adjust(
    cfg: SystemConfig,
    mesh: Mesh,
    poses0,
    fixed,
    front: PointBlocks,
    bird: PointBlocks,
    odom: OdomEdges,
    n_iters_1: Optional[int] = None,
    n_iters_2: Optional[int] = None,
) -> BAResult:
    """Global BA with landmark blocks sharded over the mesh's ``pt`` axis."""
    n_pt = mesh.shape["pt"]
    front = pad_blocks_to(front, -(-front.Xw.shape[0] // n_pt) * n_pt)
    bird = pad_blocks_to(bird, -(-bird.Xw.shape[0] // n_pt) * n_pt)

    blk = PointBlocks(
        Xw=P("pt"), kf_idx=P("pt"), meas=P("pt"), inv_sigma2=P("pt"),
        valid=P("pt"), point_valid=P("pt"),
    )
    rep_odom = OdomEdges(i=P(), j=P(), T_meas=P(), info=P(), valid=P())
    out_spec = BAResult(
        poses=P(), front_Xw=P("pt"), bird_Xw=P("pt"),
        front_inlier=P("pt"), bird_inlier=P("pt"),
    )

    sharded = _jitted_sharded_ba(cfg, mesh, n_iters_1, n_iters_2, blk, rep_odom, out_spec)
    return sharded(poses0, fixed, front, bird, odom)


@functools.lru_cache(maxsize=16)
def _jitted_sharded_ba_cached(cfg, mesh, n_iters_1, n_iters_2):
    blk = PointBlocks(
        Xw=P("pt"), kf_idx=P("pt"), meas=P("pt"), inv_sigma2=P("pt"),
        valid=P("pt"), point_valid=P("pt"),
    )
    rep_odom = OdomEdges(i=P(), j=P(), T_meas=P(), info=P(), valid=P())
    out_spec = BAResult(
        poses=P(), front_Xw=P("pt"), bird_Xw=P("pt"),
        front_inlier=P("pt"), bird_inlier=P("pt"),
    )
    fn = functools.partial(
        bundle_adjust, cfg.camera, cfg.ba,
        n_iters_1=n_iters_1, n_iters_2=n_iters_2, axis_name="pt",
    )
    # CRITICAL: shard_map must run under jit — eagerly it dispatches one
    # multi-device program per primitive (observed ~100x compile blowup)
    return jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(), blk, blk, rep_odom),
        out_specs=out_spec,
        check_rep=False,
    ))


def _jitted_sharded_ba(cfg, mesh, n_iters_1, n_iters_2, blk, rep_odom, out_spec):
    return _jitted_sharded_ba_cached(cfg, mesh, n_iters_1, n_iters_2)


def batched_pose_optimization(cfg: SystemConfig, mesh: Mesh, Tcw0_batch,
                              front_batch: FrontObs, bird_batch: BirdObs):
    """DP harness: independent per-frame pose optimizations sharded over ``dp``
    (the multi-sequence throughput configuration of BASELINE.json)."""
    # use_fused=False: the Pallas LM kernel is single-problem; under vmap the
    # XLA op-graph path batches cleanly (the batch supplies the parallelism the
    # fused kernel exists to recover)
    vf = jax.vmap(lambda T, f, b: pose_optimization(cfg.camera, cfg.ba, T, f, b,
                                                    use_fused=False))
    spec_f = FrontObs(Xw=P("dp"), uv=P("dp"), inv_sigma2=P("dp"), valid=P("dp"))
    spec_b = BirdObs(Xw=P("dp"), Xc=P("dp"), inv_sigma2=P("dp"), valid=P("dp"))
    from fishbirdeyevisualslam_tpu.solvers.pose_opt import PoseOptResult
    sharded = shard_map(
        vf, mesh=mesh,
        in_specs=(P("dp"), spec_f, spec_b),
        out_specs=PoseOptResult(Tcw=P("dp"), front_inlier=P("dp"),
                                bird_inlier=P("dp"), n_inliers=P("dp")),
        check_rep=False,
    )
    return sharded(Tcw0_batch, front_batch, bird_batch)
