"""Benchmark: tracked frames/s per chip on the device JAX selects (real TPU under
the driver; CPU if forced).

Measures the REAL per-frame device program the system dispatches for every OK
frame: dual-view ORB extraction (8-level pyramid, fisheye undistortion) via
``build_frame`` plus the ENTIRE fused tracking core ``track_frame_core``
(dual-radius motion-model match vs a 16384-point map, bird-point match,
per-frame bird landmark maintenance, two 4x10 LM pose optimizations, local-map
stage, keyframe-policy counters) — the same work the reference does per frame
in ``Tracking::GrabImageMonocularWithOdom`` (SURVEY.md §3.2 hot loops 1-3).
Round 2's bench used a simplified stand-in step; this is the production one.

Baseline: the reference paces to its camera's 25 fps and claims real-time
(``fisheye.yaml:19``, ``README.md:11``; no published numbers — BASELINE.md).
``vs_baseline`` is therefore fps / 25.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fishbirdeyevisualslam_tpu.config import SystemConfig
    from fishbirdeyevisualslam_tpu.geometry import se3
    from fishbirdeyevisualslam_tpu.slam import map_state as ms, tracking as tr
    from fishbirdeyevisualslam_tpu.slam.frame import build_frame

    cfg = SystemConfig()
    cap = cfg.capacity
    rng = np.random.RandomState(0)

    # populated map at full default capacities (the steady-state working set)
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
        # spread so the 5 m bird window holds ~2k points (the soak measured
        # window counts of hundreds-to-2.6k, not half the store)
        bp_pos=jnp.asarray(np.stack([
            rng.uniform(0, 25, PB), rng.uniform(-12, 12, PB), np.zeros(PB)
        ], -1).astype(np.float32)),
        bp_desc=jnp.asarray(rng.randint(0, 2**32, (PB, 8), dtype=np.uint64).astype(np.uint32)),
        bp_desc_pm1=jnp.asarray(rng.choice([-1.0, 1.0], (PB, 256)).astype(np.float32), jnp.bfloat16),
        bp_valid=jnp.ones((PB,), bool),
        kf_valid=m.kf_valid.at[:K].set(True),
        kf_seq=m.kf_seq.at[:K].set(jnp.arange(K)),
        n_kf=jnp.int32(K), kf_counter=jnp.int32(K),
        # only a window-sized slice of the map is observed by the active KFs
        # (the covisibility local window measured ~600-3400 points in the r4
        # soak; all-points-local would shape a window no mature map has)
        obs_kf=m.obs_kf.at[:3072, 0].set(
            jnp.arange(3072, dtype=jnp.int32) % K),
        obs_valid=m.obs_valid.at[:3072, 0].set(True),
    )

    cam = cfg.camera
    front_img = jnp.asarray(rng.rand(cam.height, cam.width).astype(np.float32) * 255)
    bird_img = jnp.asarray(rng.rand(cfg.bird.rows, cfg.bird.cols).astype(np.float32) * 255)
    bmask = jnp.ones((cfg.bird.rows, cfg.bird.cols), jnp.float32) * 255
    f0 = build_frame(front_img, bird_img, bmask, jnp.zeros(3), jnp.asarray(0.0),
                     cfg, cap.max_front_kp, None, cap.max_bird_kp)
    f_last = f0._replace(odom=jnp.asarray([-0.3, 0.0, 0.0]))
    last_bp = jnp.full((cap.max_bird_kp,), -1, jnp.int32)
    # motion-model candidates: the REAL cand_last is the id-list union of the
    # last frame's associations and the reference KF's points (2 x F entries,
    # ~2k valid ids, holes = -1) — exactly what SlamSystem._track_ok passes
    cand_idx = rng.choice(P, cap.max_front_kp, replace=False).astype(np.int32)
    cand_np = np.full(2 * cap.max_front_kp, -1, np.int32)
    cand_np[::2] = cand_idx  # interleave holes like a real association array
    cand = jnp.asarray(cand_np)
    Tcw = se3.identity()

    step = jax.jit(tr.track_frame_core, static_argnums=(2,))

    # the REAL per-frame device work, streamed with the host out of the loop:
    # dual-view ORB extraction + undistort (build_frame) and the whole fused
    # tracking core (motion-model dual-radius match, bird map match, per-frame
    # bird maintenance, two pose optimizations, local-map stage, policy
    # counters) — what SlamSystem.track dispatches for every OK frame
    n_stream = 32

    @jax.jit
    def stream(front_img, bird_img, Tcw0):
        def body(carry, i):
            T = carry
            f = build_frame(front_img + i.astype(jnp.float32), bird_img, bmask,
                            jnp.zeros(3), i.astype(jnp.float32), cfg,
                            cap.max_front_kp, None, cap.max_bird_kp)
            out = step(m, f, cfg, T, cand, jnp.int32(0),
                       tr.bird_only_view(f_last), last_bp, T, jnp.asarray(True))
            return out.Tcw, out.scalars
        T_final, ns = jax.lax.scan(body, Tcw0, jnp.arange(n_stream))
        return T_final, ns

    out = stream(front_img, bird_img, Tcw)
    out[0].block_until_ready()
    n_rep = 3
    # vary the seed pose per repetition: identical-input executions can be
    # deduped by the experimental tunnel backend (observed fantasy timings in
    # round 3) — each rep must be genuinely distinct work
    seeds = [jnp.asarray(np.asarray(Tcw) + np.array(
        [0, 0, 0, 0, 1e-4 * (r + 1), 0, 0], np.float32)) for r in range(n_rep)]
    t0 = time.perf_counter()
    for r in range(n_rep):
        out = stream(front_img, bird_img, seeds[r])
    out[0].block_until_ready()
    dt = (time.perf_counter() - t0) / (n_rep * n_stream)
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "tracking_step_fps",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 25.0, 3),
    }))


if __name__ == "__main__":
    main()
