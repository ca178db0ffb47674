"""Model-violating-world validation (VERDICT r3 next #7).

Runs the SLAM (unperturbed config) over sequences rendered by io.realism —
non-flat ground, miscalibrated extrinsics, IPM scale error, 3D clutter,
photoreal-statistics textures — optionally stacked with the sensor-degradation
model.  This is the closest available stand-in for real imagery in a
zero-egress environment: the estimator's assumed models are systematically
WRONG about the world that generated the pixels."""
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

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.io import realism, synthetic
from fishbirdeyevisualslam_tpu.io.evaluate import ate_rmse_vs_gt
from fishbirdeyevisualslam_tpu.geometry import odometry as odo
from fishbirdeyevisualslam_tpu.slam.system import SlamSystem
from fishbirdeyevisualslam_tpu.slam import tracking as tr


def run(n_frames=80, kind="circle", noise=0.02, seed=0, degraded=False,
        rc=None, cfg=None, tag=""):
    import jax.numpy as jnp
    cfg = cfg or SystemConfig()
    seq = realism.make_real_sequence(
        cfg, n_frames=n_frames, kind=kind, odom_noise=noise, seed=seed,
        rc=rc or realism.RealismConfig(),
        degrade=synthetic.DegradeConfig() if degraded else None)
    sys_ = SlamSystem(cfg)
    for i, fr in enumerate(seq.frames):
        sys_.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i],
                   fr["timestamp"], contour=fr["contour"])
    sys_.finish()
    states = [e.state for e in sys_.trajectory]
    est = sys_.frame_trajectory_Twb()
    ate = float(ate_rmse_vs_gt(est, seq.gt))
    dead = np.stack([np.asarray(odo.se2_to_se3(jnp.asarray(o))) for o in seq.odom])
    ate_odo = float(ate_rmse_vs_gt(dead, seq.gt))
    print(f"[realism]{tag} kind={kind} n={n_frames} noise={noise} seed={seed} "
          f"degraded={degraded}: "
          f"lost={sum(s == tr.LOST for s in states)} "
          f"kf={int(sys_.map.n_kf) if sys_.map is not None else 0} "
          f"loops={sys_.n_loops_closed} ATE={ate:.3f} m "
          f"(odom-only {ate_odo:.3f} m)", flush=True)
    return ate


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    run(n, "circle", 0.02, 0, degraded=False)
    run(n, "circle", 0.02, 0, degraded=True)
    if "--parity" in sys.argv:
        from fishbirdeyevisualslam_tpu.config import reference_parity
        run(n, "circle", 0.02, 0, degraded=False, cfg=reference_parity(),
            tag="[parity]")
        run(n, "circle", 0.02, 0, degraded=True, cfg=reference_parity(),
            tag="[parity]")
