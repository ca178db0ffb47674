"""E2E SLAM accuracy check on whatever backend JAX selects (TPU under the
driver tunnel, CPU if JAX_PLATFORMS=cpu).  Prints backend, ATE, and tracking
health — the oracle STATUS.md's TPU-vs-CPU accuracy gap was measured with."""

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


def main(n_frames=20, kind="arc", step=0.5, use_contour=True):
    print("backend:", jax.default_backend())
    cfg = SystemConfig()
    seq = synthetic.make_sequence(cfg, n_frames=n_frames, kind=kind, step=step)
    sys_ = SlamSystem(cfg)
    t0 = time.time()
    for i, fr in enumerate(seq.frames):
        sys_.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i], fr["timestamp"],
                   contour=fr.get("contour") if use_contour else None)
    wall = time.time() - t0
    states = [e.state for e in sys_.trajectory]
    est = sys_.frame_trajectory_Twb()
    ate = ate_rmse_vs_gt(est, seq.gt)
    print(f"frames={n_frames} ok={sum(s == tr.OK for s in states)} "
          f"lost={sum(s == tr.LOST for s in states)} kf={int(sys_.map.n_kf)} "
          f"mp={int(np.asarray(sys_.map.mp_valid).sum())} "
          f"bp={int(np.asarray(sys_.map.bp_valid).sum())}")
    print(f"ATE={float(ate):.4f} m   wall={wall:.1f}s")
    return float(ate)


if __name__ == "__main__":
    import sys
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    main(n_frames=n)
