"""Worker for the multi-process distributed-BA parity test.

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize`` joins
them into one 8-device job (the DCN-shaped configuration SURVEY §4/§7
prescribe, run on localhost).  Every process builds the SAME deterministic
problem, constructs global arrays from process-local shards, runs the sharded
global BA (landmark blocks over the ``pt`` axis, reduced camera system
psum'd), and process 0 checks parity against a plain single-device solve.

Usage: python multiprocess_ba_worker.py <process_id> <num_processes> <port>
Prints ``PARITY_OK <max_err>`` on success (process 0).
"""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PID = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]
N_LOCAL = 4

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N_LOCAL}").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["FBEV_ALLOW_CPU_MESH"] = "1"

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=NPROC, process_id=PID)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import __graft_entry__ as g
from fishbirdeyevisualslam_tpu.solvers.ba import PointBlocks, bundle_adjust
from fishbirdeyevisualslam_tpu.parallel.sharded_ba import distributed_bundle_adjust


def main():
    n_dev = NPROC * N_LOCAL
    cfg, poses0, fixed, front, bird, odom = g._example_problem(
        K=6, P=16 * n_dev, PB=8 * n_dev, M=3)
    # identical numpy problem on every process (same seed inside _example_problem)
    host = jax.tree_util.tree_map(np.asarray, (poses0, fixed, front, bird, odom))
    poses0, fixed, front, bird, odom = host

    devices = np.asarray(jax.devices()).reshape(1, n_dev)
    mesh = Mesh(devices, ("dp", "pt"))

    def to_global(x, spec):
        s = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            x.shape, s, lambda idx: np.ascontiguousarray(x[idx]))

    blk = PointBlocks(Xw=P("pt"), kf_idx=P("pt"), meas=P("pt"),
                      inv_sigma2=P("pt"), valid=P("pt"), point_valid=P("pt"))
    g_front = jax.tree_util.tree_map(to_global, front, blk)
    g_bird = jax.tree_util.tree_map(to_global, bird, blk)
    g_poses = to_global(poses0, P())
    g_fixed = to_global(fixed, P())
    g_odom = jax.tree_util.tree_map(lambda x: to_global(x, P()), odom)

    with mesh:
        out = distributed_bundle_adjust(
            cfg, mesh, g_poses, g_fixed, g_front, g_bird, g_odom,
            n_iters_1=5, n_iters_2=5)
        jax.block_until_ready(out.poses)
    dist_poses = np.asarray(out.poses)  # replicated output

    # single-device reference (local, no collectives)
    ref = bundle_adjust(cfg.camera, cfg.ba, jnp.asarray(poses0),
                        jnp.asarray(fixed), jax.tree_util.tree_map(jnp.asarray, front),
                        jax.tree_util.tree_map(jnp.asarray, bird),
                        jax.tree_util.tree_map(jnp.asarray, odom),
                        n_iters_1=5, n_iters_2=5)
    err = float(np.abs(dist_poses - np.asarray(ref.poses)).max())
    if PID == 0:
        assert err < 1e-3, f"parity failure: {err}"
        print(f"PARITY_OK {err:.2e}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
