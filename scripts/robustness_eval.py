"""Robustness oracle: long noisy-odometry circle on CPU (the hardening metric
tracked in STATUS.md).  Prints lost frames, keyframes, ATE for SLAM vs
odometry-only dead reckoning."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
TPU_MODE = os.environ.get("FBEV_EVAL_TPU", "") == "1"
if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
if TPU_MODE:
    jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:
    jax.config.update("jax_platforms", "cpu")
# persistent cache disabled on CPU: XLA:CPU AOT reload segfaults on this host
# (see tests/conftest.py)

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.io import synthetic
from fishbirdeyevisualslam_tpu.io.evaluate import ate_rmse_vs_gt
from fishbirdeyevisualslam_tpu.geometry import odometry as odo, ipm, se3
from fishbirdeyevisualslam_tpu.slam.system import SlamSystem
from fishbirdeyevisualslam_tpu.slam import tracking as tr


def run(n_frames=80, kind="circle", noise=0.02, seed=0, use_contour=True,
        bird_gate_mult=None, degraded=False, cfg=None, tag=""):
    if cfg is None:
        cfg = SystemConfig()
    if bird_gate_mult is not None:
        import dataclasses
        cfg = cfg.replace(bird=dataclasses.replace(
            cfg.bird, filter_gate_mult=bird_gate_mult))
    seq = synthetic.make_sequence(
        cfg, n_frames=n_frames, kind=kind, odom_noise=noise, seed=seed,
        degrade=synthetic.DegradeConfig() if degraded else None)
    sys_ = SlamSystem(cfg)
    for i, fr in enumerate(seq.frames):
        sys_.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i], fr["timestamp"],
                   contour=fr.get("contour") if use_contour else None)
    sys_.finish()
    states = [e.state for e in sys_.trajectory]
    est = sys_.frame_trajectory_Twb()
    ate = ate_rmse_vs_gt(est, seq.gt)
    # odometry dead-reckoning baseline
    import jax.numpy as jnp
    dead = np.stack([np.asarray(odo.se2_to_se3(jnp.asarray(o))) for o in seq.odom])
    ate_odo = ate_rmse_vs_gt(dead, seq.gt)
    # keyframe-only ATE (post-BA poses; separates inter-KF tracking jitter
    # from the optimized trajectory)
    ate_kf = float("nan")
    if sys_.map is not None:
        m = sys_.map
        kf_rows = [(int(m.kf_frame_id[k]), k) for k in range(int(m.n_kf))
                   if bool(m.kf_valid[k]) and 0 <= int(m.kf_frame_id[k]) < n_frames]
        if len(kf_rows) >= 3:
            from fishbirdeyevisualslam_tpu.geometry import ipm, se3
            Twb = np.stack([np.asarray(ipm.Twb_from_Twc(
                cfg.extrinsics, se3.inverse(m.kf_Tcw[k]))) for _, k in kf_rows])
            gt_kf = np.asarray(seq.gt)[[i for i, _ in kf_rows]]
            ate_kf = float(ate_rmse_vs_gt(Twb, gt_kf))
    print(f"{tag}kind={kind} n={n_frames} noise={noise} seed={seed} contour={use_contour} "
          f"degraded={degraded}: "
          f"lost={sum(s == tr.LOST for s in states)} kf={int(sys_.map.n_kf) if sys_.map is not None else 0} "
          f"loops={sys_.n_loops_closed} ATE={float(ate):.3f} m "
          f"(KF-only {ate_kf:.3f} m, odom-only {float(ate_odo):.3f} m)")
    return float(ate)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=80)
    p.add_argument("--kind", default="circle")
    p.add_argument("--noise", type=float, default=0.02)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-contour", action="store_true")
    p.add_argument("--bird-gate-mult", type=float, default=None,
                   help="override BirdConfig.filter_gate_mult (reference = 1.0)")
    p.add_argument("--degraded", action="store_true",
                   help="sensor-degraded rendering (exposure walk, noise, "
                        "vignette, motion blur, IPM seams, contour dropout)")
    a = p.parse_args()
    run(a.frames, a.kind, a.noise, a.seed, use_contour=not a.no_contour,
        bird_gate_mult=a.bird_gate_mult, degraded=a.degraded)
