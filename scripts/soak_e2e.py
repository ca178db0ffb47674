"""Long-sequence soak: keyframe insertion must survive past ``max_keyframes``
LIFETIME insertions at DEFAULT capacities (VERDICT round-2 missing #1 "done"
criterion: 600+ frames, capacities unchanged, kf_counter > 256, stable ATE).

A 700-frame noisy-odometry circle with a dense keyframe policy
(max_frames_between_kf=2 -> ~350 lifetime insertions) drives the 256-slot map
through full recycling: redundancy culling frees what it can, the
capacity-pressure eviction covers the rest, and the trajectory export must
stay consistent while reference keyframes die under it.

Runs on whatever backend JAX selects (TPU under the driver tunnel).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.io import synthetic
from fishbirdeyevisualslam_tpu.io.evaluate import ate_rmse_vs_gt
from fishbirdeyevisualslam_tpu.slam.system import SlamSystem
from fishbirdeyevisualslam_tpu.slam import tracking as tr


def main(n_frames=700):
    print("backend:", jax.default_backend(), flush=True)
    cfg = SystemConfig()
    cfg = cfg.replace(tracking=dataclasses.replace(
        cfg.tracking, max_frames_between_kf=2))
    t0 = time.time()
    seq = synthetic.make_sequence(cfg, n_frames=n_frames, kind="circle",
                                  step=0.25, odom_noise=0.02)
    print(f"rendered {n_frames} frames in {time.time() - t0:.0f}s", flush=True)
    sys_ = SlamSystem(cfg)
    t0 = time.time()
    for i, fr in enumerate(seq.frames):
        sys_.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i],
                   fr["timestamp"], contour=fr["contour"])
        if (i + 1) % 100 == 0:
            m = sys_.map
            print(f"  frame {i+1}: state={sys_.state} "
                  f"kf_lifetime={int(m.kf_counter) if m is not None else 0} "
                  f"kf_live={int(np.asarray(m.kf_valid).sum()) if m is not None else 0} "
                  f"loops={sys_.n_loops_closed} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    sys_.finish()
    m = sys_.map
    states = [e.state for e in sys_.trajectory]
    est = sys_.frame_trajectory_Twb()
    ate = float(ate_rmse_vs_gt(est, seq.gt))
    ate_tail = float(ate_rmse_vs_gt(est[-100:], seq.gt[-100:]))
    kf_lifetime = int(m.kf_counter)
    kf_live = int(np.asarray(m.kf_valid).sum())
    print(f"SOAK frames={n_frames} ok={sum(s == tr.OK for s in states)} "
          f"lost={sum(s == tr.LOST for s in states)} "
          f"kf_lifetime={kf_lifetime} kf_live={kf_live} "
          f"dead_anchors={len(sys_._dead_kf_poses)} "
          f"loops={sys_.n_loops_closed}", flush=True)
    print(f"SOAK ATE={ate:.4f} m  ATE(last 100)={ate_tail:.4f} m", flush=True)
    assert kf_lifetime > cfg.capacity.max_keyframes, (
        "soak must exceed lifetime capacity", kf_lifetime)
    print("SOAK PASS: insertion survived past",
          cfg.capacity.max_keyframes, "lifetime keyframes", flush=True)
    return ate, kf_lifetime, kf_live


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 700
    main(n)
