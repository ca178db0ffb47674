"""Honest end-to-end system benchmark + accuracy check on whatever backend JAX
selects (real TPU under the driver tunnel, CPU if JAX_PLATFORMS=cpu).

Unlike bench.py (a scanned device-step stream with the host out of the loop),
this drives the FULL ``SlamSystem.track()`` — host state machine, per-frame
scalar fetch, keyframe insertion, local mapping, BA, loop closing — over a
rendered synthetic sequence and reports warm per-frame wall time (median +
mean ms), the number the reference's own oracle prints
(``mono_encoder.cc:202-210``).  Two passes over the same frames: pass 1 warms
every compile; pass 2 is timed.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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


def run_once(cfg, seq, use_contour=True, label=""):
    sys_ = SlamSystem(cfg)
    times = []
    for i, fr in enumerate(seq.frames):
        t0 = time.perf_counter()
        sys_.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i],
                   fr["timestamp"],
                   contour=fr.get("contour") if use_contour else None)
        times.append(time.perf_counter() - t0)
    sys_.finish()
    states = [e.state for e in sys_.trajectory]
    est = sys_.frame_trajectory_Twb()
    ate = ate_rmse_vs_gt(est, seq.gt)
    t = np.sort(np.asarray(times))
    med = float(np.median(t))
    mean = float(t.mean())
    print(f"[{label}] frames={len(seq.frames)} ok={sum(s == tr.OK for s in states)} "
          f"lost={sum(s == tr.LOST for s in states)} "
          f"kf={int(sys_.map.n_kf) if sys_.map is not None else 0} "
          f"mp={int(np.asarray(sys_.map.mp_valid).sum()) if sys_.map is not None else 0} "
          f"bp={int(np.asarray(sys_.map.bp_valid).sum()) if sys_.map is not None else 0} "
          f"loops={sys_.n_loops_closed}", flush=True)
    print(f"[{label}] ATE={float(ate):.4f} m  median={med * 1e3:.2f} ms  "
          f"mean={mean * 1e3:.2f} ms  fps(median)={1.0 / max(med, 1e-9):.1f}",
          flush=True)
    return float(ate), med, mean


def main(n_frames=100, kind="circle", step=0.35, use_contour=True):
    print("backend:", jax.default_backend(), flush=True)
    cfg = SystemConfig()
    t0 = time.time()
    seq = synthetic.make_sequence(cfg, n_frames=n_frames, kind=kind, step=step,
                                  odom_noise=0.02)
    print(f"rendered {n_frames} frames in {time.time() - t0:.0f}s", flush=True)
    # pass 1: warm every compile path (init / track / KF / mapping / loop)
    run_once(cfg, seq, use_contour, label="warm")
    # pass 2: timed
    ate, med, mean = run_once(cfg, seq, use_contour, label="timed")
    return ate, med, mean


if __name__ == "__main__":
    import sys
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    main(n_frames=n)
