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


def make_mesh(n_pt: Optional[int] = None, n_dp: int = 1,
              allow_cpu_fallback: Optional[bool] = None) -> Mesh:
    """Build a ('dp', 'pt') mesh from the default backend's devices.

    When the default backend has fewer than ``n_dp * n_pt`` devices the host
    CPU backend (which honors ``--xla_force_host_platform_device_count``) is
    substituted ONLY if ``allow_cpu_fallback`` — explicitly, or via the
    ``FBEV_ALLOW_CPU_MESH=1`` env var set by the dry-run/test harnesses.
    Production callers over-requesting shards get an error, not a silent
    ~100x-slower CPU mesh.
    """
    import os
    import warnings
    if allow_cpu_fallback is None:
        allow_cpu_fallback = os.environ.get("FBEV_ALLOW_CPU_MESH", "") == "1"
    devs = np.asarray(jax.devices())
    if n_pt is not None and len(devs) < n_dp * n_pt:
        if not allow_cpu_fallback:
            raise ValueError(
                f"make_mesh needs {n_dp * n_pt} devices but the default backend "
                f"({jax.default_backend()}) has {len(devs)}. For virtual-mesh "
                "validation pass allow_cpu_fallback=True (or set "
                "FBEV_ALLOW_CPU_MESH=1) with "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N.")
        warnings.warn(
            f"make_mesh: default backend has {len(devs)} devices < "
            f"{n_dp * n_pt}; falling back to host CPU devices (validation "
            "mode, ~100x slower than TPU).", stacklevel=2)
        devs = np.asarray(jax.devices("cpu"))
    if n_pt is None:
        n_pt = len(devs) // n_dp
    if len(devs) < n_dp * n_pt:
        raise ValueError(
            f"make_mesh needs {n_dp * n_pt} devices, found {len(devs)} "
            f"(set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_dp * n_pt} before the CPU backend initializes).")
    return Mesh(devs[: n_dp * n_pt].reshape(n_dp, n_pt), ("dp", "pt"))


def put_on_mesh(tree, mesh: Mesh):
    """``jax.device_put`` a pytree of replicated arrays onto the mesh's backend.

    Needed when example/eager arrays were committed to a different backend
    than the mesh (e.g. default TPU backend + CPU validation mesh): feeding
    cross-backend arrays into a jitted shard_map raises JAX's
    'Received incompatible devices' error.
    """
    from jax.sharding import NamedSharding
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


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
    # inputs may be committed to a different backend than the mesh (single
    # real TPU chip + CPU validation mesh): move them onto the mesh's devices
    if mesh.devices.flat[0].platform != jax.devices()[0].platform:
        poses0, fixed, front, bird, odom = put_on_mesh(
            (poses0, fixed, front, bird, odom), mesh)

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
    if mesh.devices.flat[0].platform != jax.devices()[0].platform:
        Tcw0_batch, front_batch, bird_batch = put_on_mesh(
            (Tcw0_batch, front_batch, bird_batch), mesh)
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
