"""track_frame_core device time, compaction caps ON vs OFF (r4 A/B)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend())

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.slam import map_state as ms, tracking as tr
from fishbirdeyevisualslam_tpu.slam.frame import build_frame


def make_inputs(cfg):
    cap = cfg.capacity
    rng = np.random.RandomState(0)
    m = ms.empty_map(cfg)
    P, PB = cap.max_points, cap.max_bird_points
    K = min(cap.max_keyframes, 32)
    m = m._replace(
        mp_pos=jnp.asarray(np.stack([
            rng.uniform(-10, 10, P), rng.uniform(-5, 5, P), rng.uniform(5, 40, P)
        ], -1).astype(np.float32)),
        mp_desc=jnp.asarray(rng.randint(0, 2**32, (P, 8), dtype=np.uint64).astype(np.uint32)),
        mp_desc_pm1=jnp.asarray(rng.choice([-1.0, 1.0], (P, 256)).astype(np.float32), jnp.bfloat16),
        mp_valid=jnp.ones((P,), bool),
        mp_max_dist=jnp.full((P,), 60.0),
        mp_min_dist=jnp.full((P,), 1.0),
        bp_pos=jnp.asarray(np.stack([
            rng.uniform(2, 12, PB), rng.uniform(-6, 6, PB), np.zeros(PB)
        ], -1).astype(np.float32)),
        bp_desc=jnp.asarray(rng.randint(0, 2**32, (PB, 8), dtype=np.uint64).astype(np.uint32)),
        bp_desc_pm1=jnp.asarray(rng.choice([-1.0, 1.0], (PB, 256)).astype(np.float32), jnp.bfloat16),
        bp_valid=jnp.ones((PB,), bool),
        kf_valid=m.kf_valid.at[:K].set(True),
        kf_seq=m.kf_seq.at[:K].set(jnp.arange(K)),
        n_kf=jnp.int32(K), kf_counter=jnp.int32(K),
        obs_kf=m.obs_kf.at[:, 0].set(jnp.arange(P, dtype=jnp.int32) % K),
        obs_valid=m.obs_valid.at[:, 0].set(True),
    )
    cam = cfg.camera
    front_img = jnp.asarray(rng.rand(cam.height, cam.width).astype(np.float32) * 255)
    bird_img = jnp.asarray(rng.rand(cfg.bird.rows, cfg.bird.cols).astype(np.float32) * 255)
    bmask = jnp.ones((cfg.bird.rows, cfg.bird.cols), jnp.float32) * 255
    f0 = build_frame(front_img, bird_img, bmask, jnp.zeros(3), jnp.asarray(0.0),
                     cfg, cap.max_front_kp, None, cap.max_bird_kp)
    f_last = f0._replace(odom=jnp.asarray([-0.3, 0.0, 0.0]))
    last_bp = jnp.full((cap.max_bird_kp,), -1, jnp.int32)
    cand_idx = rng.choice(P, 2 * cap.max_front_kp, replace=False)
    cand = jnp.zeros((P,), bool).at[jnp.asarray(cand_idx)].set(True)
    return m, f0, f_last, last_bp, cand


def run(label, cfg):
    m, f0, f_last, last_bp, cand = make_inputs(cfg)
    step = jax.jit(tr.track_frame_core, static_argnums=(2,))
    R = 32

    @jax.jit
    def sweep(T0):
        def body(T, i):
            out = step(m, f0, cfg, T, cand, jnp.int32(0),
                       tr.bird_only_view(f_last), last_bp, T, jnp.asarray(True))
            return se3.compose(out.Tcw, T0), out.scalars[0]
        T, ns = jax.lax.scan(body, T0, jnp.arange(R))
        return T, ns

    T0 = se3.identity()
    jax.block_until_ready(sweep(T0))
    seeds = [jnp.asarray(np.asarray(T0) + np.array([0, 0, 0, 0, 1e-4 * (r + 1), 0, 0],
                                                   np.float32)) for r in range(3)]
    t0 = time.perf_counter()
    outs = [sweep(s) for s in seeds]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (3 * R)
    print(f"{label:28s} {dt*1e3:7.3f} ms/frame")


cfg_on = SystemConfig()
cfg_off = cfg_on.replace(tracking=dataclasses.replace(
    cfg_on.tracking, match_compact_cap=0, local_match_compact_cap=0,
    bird_match_compact_cap=0))
run("compaction ON", cfg_on)
run("compaction OFF", cfg_off)
