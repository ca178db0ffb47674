"""Per-iteration slope of bundle_adjust on chip (varied seeds, dedupe-proof)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.slam.loop_closing import map_point_blocks
from fishbirdeyevisualslam_tpu.slam.tracking import odom_chain_edges
from fishbirdeyevisualslam_tpu.solvers.ba import bundle_adjust
from scripts.bench_scaling import make_realistic_map


def main():
    cfg = SystemConfig()
    m = make_realistic_map(cfg)
    front, bird = map_point_blocks(m, cfg)
    odom = odom_chain_edges(m, cfg, m.kf_valid)
    poses0 = m.kf_Tcw
    fixed = (~m.kf_valid) | (jnp.arange(m.K) == 0)
    reps = 3
    for it1, it2 in ((1, 0), (3, 0), (5, 10)):
        seeds = [poses0.at[1:, 4].add(1e-5 * (r + 1)) for r in range(reps)]
        out = bundle_adjust(cfg.camera, cfg.ba, poses0, fixed, front, bird,
                            odom, n_iters_1=it1, n_iters_2=it2)
        jax.block_until_ready(out.poses)
        t0 = time.perf_counter()
        outs = [bundle_adjust(cfg.camera, cfg.ba, sp, fixed, front, bird,
                              odom, n_iters_1=it1, n_iters_2=it2)
                for sp in seeds]
        jax.block_until_ready([o.poses for o in outs])
        dt = (time.perf_counter() - t0) / reps
        print(f"iters=({it1},{it2}): {dt*1e3:8.1f} ms/BA", flush=True)


if __name__ == "__main__":
    main()
