"""Benchmark: tracked frames/s per chip on the device JAX selects (real TPU under
the driver; CPU if forced).

Measures the fused per-frame tracking compute — dual-view ORB extraction (2000 +
2000 features, 8-level pyramid), fisheye undistortion, map-point matching
(2048x16384 masked Hamming via MXU matmul), bird-point matching, and the 4x10 LM
pose optimization — as one jitted device program, the same work the reference
does per frame in ``Tracking::GrabImageMonocularWithOdom`` (SURVEY.md §3.2 hot
loops 1-3).

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
    from fishbirdeyevisualslam_tpu.geometry import se3, camera as cam_ops
    from fishbirdeyevisualslam_tpu.ops import features, matcher
    from fishbirdeyevisualslam_tpu.slam.frame import desc_pm1_from_packed
    from fishbirdeyevisualslam_tpu.solvers.pose_opt import (
        FrontObs, BirdObs, pose_optimization,
    )

    cfg = SystemConfig()
    cam = cfg.camera
    rng = np.random.RandomState(0)

    # synthetic inputs shaped like the real pipeline
    front_img = jnp.asarray(rng.rand(cam.height, cam.width).astype(np.float32) * 255)
    bird_img = jnp.asarray(rng.rand(cfg.bird.rows, cfg.bird.cols).astype(np.float32) * 255)
    P = 16384
    map_desc = jnp.asarray(
        rng.randint(0, 2**32, (P, 8), dtype=np.uint64).astype(np.uint32))
    map_pos = jnp.asarray(np.stack([
        rng.uniform(-10, 10, P), rng.uniform(-5, 5, P), rng.uniform(5, 40, P)
    ], -1).astype(np.float32))
    map_valid = jnp.ones((P,), bool)
    PB = 4096
    bp_pos = jnp.asarray(np.stack([
        rng.uniform(2, 12, PB), rng.uniform(-6, 6, PB), np.zeros(PB)
    ], -1).astype(np.float32))
    bp_desc = jnp.asarray(
        rng.randint(0, 2**32, (PB, 8), dtype=np.uint64).astype(np.uint32))
    lut = jnp.asarray(cfg.orb.inv_level_sigma2())

    nf = cfg.orb.n_features
    # unpacked +/-1 map descriptors are frame-invariant: compute once, keep on
    # device (the map store caches them between frames in a real deployment)
    map_pm1 = desc_pm1_from_packed(map_desc)
    bp_pm1 = desc_pm1_from_packed(bp_desc)

    def tracking_step(front_img, bird_img, Tcw_pred, map_pos, map_pm1, bp_pos, bp_pm1):
        # dual-view extraction
        kp = features._extract_impl(front_img, cfg.orb, nf)
        uv = cam_ops.undistort_fisheye(cam, kp.xy)
        bkp = features._extract_impl(bird_img, cfg.orb, nf)
        from fishbirdeyevisualslam_tpu.geometry import ipm
        bird_cam = ipm.bird_pixel_to_cam_xyz(cfg.bird, cfg.extrinsics, bkp.xy)
        # project map + masked matching (front)
        pc = se3.transform(Tcw_pred, map_pos)
        uv_proj = cam_ops.project_pinhole(cam, pc)
        vis = (pc[:, 2] > 0.1) & (uv_proj[:, 0] >= 0) & (uv_proj[:, 0] < cam.width) \
            & (uv_proj[:, 1] >= 0) & (uv_proj[:, 1] < cam.height)
        import os
        fused_on = (jax.default_backend() == "tpu"
                    and cfg.tracking.use_fused_matcher
                    and os.environ.get("FBEV_FUSED_MATCH", "1") != "0")
        if fused_on:
            # production path: fused MXU match, distance matrix stays in VMEM
            from fishbirdeyevisualslam_tpu.ops.pallas_matcher import (
                fused_projection_match,
            )
            res = fused_projection_match(
                kp.desc_pm1, uv, kp.level, kp.valid,
                map_pm1, uv_proj, jnp.float32(15.0),
                jnp.zeros((P,), jnp.float32), vis,
                max_dist=float(cfg.matcher.th_high))
            bres = fused_projection_match(
                bkp.desc_pm1, bkp.xy, bkp.level, bkp.valid,
                bp_pm1, jnp.zeros((PB, 2), jnp.float32),
                jnp.float32(1e6), jnp.zeros((PB,), jnp.float32),
                jnp.ones((PB,), bool),
                max_dist=float(cfg.matcher.th_high))
            res = matcher.resolve_duplicates(res, P)
            pcb = se3.transform(Tcw_pred, bp_pos)
        else:
            compat = matcher.window_mask(uv, uv_proj, 15.0) & kp.valid[:, None] & vis[None, :]
            res = matcher.match(kp.desc_pm1, map_pm1, compat,
                                max_dist=float(cfg.matcher.th_high))
            res = matcher.resolve_duplicates(res, P)
            # bird matching
            pcb = se3.transform(Tcw_pred, bp_pos)
            bres = matcher.match(bkp.desc_pm1, bp_pm1,
                                 bkp.valid[:, None] & jnp.ones((1, PB), bool),
                                 max_dist=float(cfg.matcher.th_high))
        # pose optimization
        pid = jnp.clip(res.idx, 0, P - 1)
        front = FrontObs(Xw=map_pos[pid], uv=uv,
                         inv_sigma2=lut[jnp.clip(kp.level, 0, 7)],
                         valid=res.ok)
        bid = jnp.clip(bres.idx, 0, PB - 1)
        bird = BirdObs(Xw=bp_pos[bid], Xc=bird_cam,
                       inv_sigma2=lut[jnp.clip(bkp.level, 0, 7)],
                       valid=bres.ok)
        out = pose_optimization(cam, cfg.ba, Tcw_pred, front, bird)
        return out.Tcw, out.n_inliers

    step = jax.jit(tracking_step)
    Tcw = se3.identity()

    # warmup / compile
    Tcw_out, n_in = step(front_img, bird_img, Tcw, map_pos, map_pm1, bp_pos, bp_pm1)
    Tcw_out.block_until_ready()

    # pipelined throughput: stream N frames through the tracking step inside one
    # device program (host out of the loop — per-call dispatch latency through
    # the test harness tunnel is NOT chip work and would otherwise dominate)
    n_stream = 32

    @jax.jit
    def stream(front_img, bird_img, Tcw0):
        def body(carry, i):
            T = carry
            T_new, n = step(front_img + i.astype(jnp.float32), bird_img,
                            T, map_pos, map_pm1, bp_pos, bp_pm1)
            return T_new, n
        T_final, ns = jax.lax.scan(body, Tcw0, jnp.arange(n_stream))
        return T_final, ns

    out = stream(front_img, bird_img, Tcw)
    out[0].block_until_ready()
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = stream(front_img, bird_img, Tcw)
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
