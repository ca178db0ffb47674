"""Cumulative ablation of ``track_frame_core`` on the selected backend: time
scanned streams of growing sub-programs to attribute the per-frame cost.

Stages:
  A  dual-radius motion-model match
  B  A + bird match + first pose opt
  C  B + local-map mask + frustum/level-gated second match + second bird match
  D  full track_frame_core (C + second pose opt + counters)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), flush=True)

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.slam import map_state as ms, tracking as tr
from fishbirdeyevisualslam_tpu.slam.frame import build_frame

cfg = SystemConfig()
cap = cfg.capacity
rng = np.random.RandomState(0)

m = ms.empty_map(cfg)
P = cap.max_points
PB = cap.max_bird_points
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
    bp_ref_kf=jnp.zeros((PB,), jnp.int32),
    kf_valid=m.kf_valid.at[:K].set(True),
    n_kf=jnp.int32(K),
    obs_kf=m.obs_kf.at[:, 0].set(jnp.arange(P, dtype=jnp.int32) % K),
    obs_valid=m.obs_valid.at[:, 0].set(True),
)

front = jnp.asarray(rng.rand(cfg.camera.height, cfg.camera.width).astype(np.float32) * 255)
bird = jnp.asarray(rng.rand(cfg.bird.rows, cfg.bird.cols).astype(np.float32) * 255)
mask = jnp.ones((cfg.bird.rows, cfg.bird.cols), jnp.float32) * 255
f = build_frame(front, bird, mask, jnp.zeros(3), jnp.asarray(0.0), cfg,
                cap.max_front_kp, None, cap.max_bird_kp)
Tcw0 = se3.identity()
cand = jnp.ones((P,), bool)


def stage_a(m, f, Tcw, cand):
    res15, res30 = tr.match_map_points_dual(
        m, f, cfg, Tcw, cand, jnp.float32(15.0), jnp.float32(cfg.matcher.th_high))
    return res15.dist, res30.dist


def stage_b(m, f, Tcw, cand):
    from fishbirdeyevisualslam_tpu.ops import matcher
    res15, res30 = tr.match_map_points_dual(
        m, f, cfg, Tcw, cand, jnp.float32(15.0), jnp.float32(cfg.matcher.th_high))
    use30 = res15.count < cfg.tracking.min_track_matches
    res = matcher.MatchResult(
        jnp.where(use30, res30.idx, res15.idx),
        jnp.where(use30, res30.dist, res15.dist),
        jnp.where(use30, res30.ok, res15.ok))
    bres = tr.match_bird_points(m, f, cfg, Tcw, tr.bird_local_mask(m, cfg, Tcw))
    out1 = tr.pose_opt_step(m, f, tr.TrackObs(res.idx, bres.idx), cfg, Tcw, Tcw)
    return out1.Tcw, res.idx


def stage_c(m, f, Tcw, cand):
    Tcw1, mp1 = stage_b(m, f, Tcw, cand)
    pt_local, _ = tr.local_map_mask(m, mp1, cfg)
    res2, vis2 = tr.match_map_points(
        m, f, cfg, Tcw1, pt_local, radius=jnp.float32(12.0),
        max_dist=jnp.float32(cfg.matcher.th_high), frustum_gates=True)
    bres2 = tr.match_bird_points(m, f, cfg, Tcw1, tr.bird_local_mask(m, cfg, Tcw1))
    return Tcw1, res2.dist, bres2.dist


def stage_d(m, f, Tcw, cand):
    out = tr.track_frame_core(m, f, cfg, Tcw, cand)
    return out.Tcw, out.scalars


def timeit(label, fn, n_stream=16, reps=3):
    @jax.jit
    def stream(m, f, Tcw):
        def body(c, i):
            out = fn(m, f, c, cand)
            # fold every output into the pose carry so no iteration can be
            # hoisted as loop-invariant or dead-code-eliminated
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out))
            return c + s * 1e-30, s
        T, s = jax.lax.scan(body, Tcw, jnp.arange(n_stream, dtype=jnp.float32))
        return T, s
    out = stream(m, f, Tcw0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = stream(m, f, Tcw0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (reps * n_stream)
    print(f"{label}: {dt * 1e3:.3f} ms", flush=True)
    return dt


names = {"A dual-match": stage_a, "B +bird+pose1": stage_b,
         "C +localmap+match2": stage_c, "D full core": stage_d}
prev = 0.0
for label, fn in names.items():
    dt = timeit(label, fn)
    print(f"   delta vs previous: {(dt - prev) * 1e3:+.3f} ms", flush=True)
    prev = dt
