"""On-chip timing of the PRODUCTION jitted global BA (loop_closing.global_ba)
at full capacity (K=256, P=16384, PB=8192) — the VERDICT r3 #2 target:
device time <= 1 s per GBA."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.slam.loop_closing import global_ba
from fishbirdeyevisualslam_tpu.slam.tracking import local_ba
from scripts.bench_scaling import make_realistic_map


def main():
    cfg = SystemConfig()
    m = make_realistic_map(cfg)
    reps = 3
    for name, fn, iters in (("global_ba (10 iters)", global_ba, 10),
                            ("global_ba (20 iters)", global_ba, 20)):
        ms_in = [m._replace(kf_Tcw=m.kf_Tcw.at[1:, 4].add(1e-5 * (r + 1)))
                 for r in range(reps)]
        out = fn(m, cfg, iters)
        jax.block_until_ready(out.kf_Tcw)
        t0 = time.perf_counter()
        outs = [fn(mi, cfg, iters) for mi in ms_in]
        jax.block_until_ready([o.kf_Tcw for o in outs])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e3:8.1f} ms", flush=True)
    # keyframe-stall analog: the compacted local BA at full capacity
    ms_in = [m._replace(kf_Tcw=m.kf_Tcw.at[1:, 4].add(1e-5 * (r + 1)))
             for r in range(reps)]
    out = local_ba(m, cfg, jnp.int32(128))
    jax.block_until_ready(out.kf_Tcw)
    t0 = time.perf_counter()
    outs = [local_ba(mi, cfg, jnp.int32(128)) for mi in ms_in]
    jax.block_until_ready([o.kf_Tcw for o in outs])
    dt = (time.perf_counter() - t0) / reps
    print(f"local_ba (compacted window): {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
