"""Cost of the compacted local BA vs max_local_bird_points (r5 known-gap
sizing probe): the dense-KF soak measured 9553 in-window bird landmarks vs the
4096 block cap.  Priority compaction keeps the strongest 4096; this measures
what RAISING the cap to cover the soak's peak costs per keyframe, to decide
the shipped default."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.slam.tracking import local_ba
from scripts.bench_scaling import make_realistic_map


def main():
    base = SystemConfig()
    m = make_realistic_map(base)
    reps = 3
    for pbl in (2048, 4096, 8192, 12288):
        cfg = dataclasses.replace(
            base, capacity=dataclasses.replace(
                base.capacity, max_local_bird_points=pbl))
        out = local_ba(m, cfg, jnp.int32(128))
        jax.block_until_ready(out.kf_Tcw)
        ms_in = [m._replace(kf_Tcw=m.kf_Tcw.at[1:, 4].add(1e-5 * (r + 1)))
                 for r in range(reps)]
        t0 = time.perf_counter()
        outs = [local_ba(mi, cfg, jnp.int32(128)) for mi in ms_in]
        jax.block_until_ready([o.kf_Tcw for o in outs])
        dt = (time.perf_counter() - t0) / reps
        print(f"max_local_bird_points={pbl:6d}: {dt*1e3:8.1f} ms/local BA",
              flush=True)


if __name__ == "__main__":
    main()
