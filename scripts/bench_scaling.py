"""Distributed-BA scaling harness (virtual CPU mesh).

One real TPU chip is available to this environment, so physical N-host ICI/DCN
scaling cannot be timed; this harness instead runs the SAME sharded global-BA
program (landmark blocks over the ``pt`` axis, reduced camera system psum'd)
on a virtual 8-device CPU mesh at n_pt = 1/2/4/8 with a FIXED total problem
(strong scaling), verifying (a) identical results at every width and (b) that
per-device work shrinks proportionally (XLA partitions the landmark axis).
Wall-clock on virtual devices shares one host's cores, so the printed
"efficiency" is a lower bound sanity number, not ICI performance.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import time

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as g
from fishbirdeyevisualslam_tpu.parallel.sharded_ba import make_mesh, distributed_bundle_adjust


def main():
    cfg, poses0, fixed, front, bird, odom = g._example_problem(
        K=12, P=32768, PB=8192, M=4)
    ref = None
    base_dt = None
    for n_pt in (1, 2, 4, 8):
        mesh = make_mesh(n_pt=n_pt, n_dp=1)
        with mesh:
            run = lambda: distributed_bundle_adjust(
                cfg, mesh, poses0, fixed, front, bird, odom,
                n_iters_1=5, n_iters_2=10)
            out = run()
            jax.block_until_ready(out.poses)
            t0 = time.perf_counter()
            for _ in range(3):
                out = run()
            jax.block_until_ready(out.poses)
            dt = (time.perf_counter() - t0) / 3
        poses = np.asarray(out.poses)
        if ref is None:
            ref, base_dt = poses, dt
        max_dev = float(np.abs(poses - ref).max())
        eff = base_dt / (dt * n_pt)
        print(f"n_pt={n_pt}  {dt*1e3:8.1f} ms/BA  speedup={base_dt/dt:5.2f}x  "
              f"eff={eff:5.1%}  max|dpose|={max_dev:.2e}")
        assert max_dev < 1e-3, "sharded BA diverged from single-device result"


if __name__ == "__main__":
    main()
