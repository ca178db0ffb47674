"""Ablation timing of the full tracking step (bench.py's program) to find
where the time goes beyond the phase sums."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend())

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3, camera as cam_ops, ipm
from fishbirdeyevisualslam_tpu.ops import features, matcher
from fishbirdeyevisualslam_tpu.ops.pallas_matcher import fused_projection_match
from fishbirdeyevisualslam_tpu.slam.frame import desc_pm1_from_packed
from fishbirdeyevisualslam_tpu.solvers.pose_opt import FrontObs, BirdObs, pose_optimization

cfg = SystemConfig()
cam = cfg.camera
rng = np.random.RandomState(0)
front_img = jnp.asarray(rng.rand(cam.height, cam.width).astype(np.float32) * 255)
bird_img = jnp.asarray(rng.rand(cfg.bird.rows, cfg.bird.cols).astype(np.float32) * 255)
P, PB = 16384, 4096
map_desc = jnp.asarray(rng.randint(0, 2**32, (P, 8), dtype=np.uint64).astype(np.uint32))
map_pos = jnp.asarray(np.stack([
    rng.uniform(-10, 10, P), rng.uniform(-5, 5, P), rng.uniform(5, 40, P)], -1).astype(np.float32))
bp_pos = jnp.asarray(np.stack([
    rng.uniform(2, 12, PB), rng.uniform(-6, 6, PB), np.zeros(PB)], -1).astype(np.float32))
bp_desc = jnp.asarray(rng.randint(0, 2**32, (PB, 8), dtype=np.uint64).astype(np.uint32))
map_pm1 = desc_pm1_from_packed(map_desc)
bp_pm1 = desc_pm1_from_packed(bp_desc)
lut = jnp.asarray(cfg.orb.inv_level_sigma2())
nf = cfg.orb.n_features
Tcw0 = se3.identity()


def make_step(do_extract=True, do_match=True, do_bird=True, do_dup=True, do_pose=True):
    def step(front_img, bird_img, Tcw):
        kp = features._extract_impl(front_img, cfg.orb, nf) if do_extract else None
        uv = cam_ops.undistort_fisheye(cam, kp.xy) if do_extract else jnp.zeros((nf, 2))
        if do_extract:
            bkp = features._extract_impl(bird_img, cfg.orb, nf)
            bird_cam = ipm.bird_pixel_to_cam_xyz(cfg.bird, cfg.extrinsics, bkp.xy)
        pc = se3.transform(Tcw, map_pos)
        uv_proj = cam_ops.project_pinhole(cam, pc)
        vis = (pc[:, 2] > 0.1)
        acc = jnp.sum(uv) * 1e-20
        if do_match:
            res = fused_projection_match(
                kp.desc_pm1, uv, kp.level, kp.valid,
                map_pm1, uv_proj, jnp.float32(15.0), jnp.zeros((P,), jnp.float32),
                vis, max_dist=float(cfg.matcher.th_high))
            if do_dup:
                res = matcher.resolve_duplicates(res, P)
            acc = acc + jnp.sum(res.dist) * 1e-20
        if do_bird:
            bres = fused_projection_match(
                bkp.desc_pm1, bkp.xy, bkp.level, bkp.valid,
                bp_pm1, jnp.zeros((PB, 2), jnp.float32), jnp.float32(1e6),
                jnp.zeros((PB,), jnp.float32), jnp.ones((PB,), bool),
                max_dist=float(cfg.matcher.th_high))
            if do_dup:
                bres = matcher.resolve_duplicates(bres, PB)
            acc = acc + jnp.sum(bres.dist) * 1e-20
        if do_pose and do_match and do_bird:
            pid = jnp.clip(res.idx, 0, P - 1)
            front = FrontObs(Xw=map_pos[pid], uv=uv,
                             inv_sigma2=lut[jnp.clip(kp.level, 0, 7)], valid=res.ok)
            bid = jnp.clip(bres.idx, 0, PB - 1)
            bird = BirdObs(Xw=bp_pos[bid], Xc=bird_cam,
                           inv_sigma2=lut[jnp.clip(bkp.level, 0, 7)], valid=bres.ok)
            out = pose_optimization(cam, cfg.ba, Tcw, front, bird)
            return out.Tcw + acc * 0
        return Tcw + acc
    return step


def timeit(step, label, n_stream=32, reps=3):
    @jax.jit
    def run(T):
        def body(c, i):
            return step(front_img + i.astype(jnp.float32), bird_img, c), 0
        out, _ = jax.lax.scan(body, T, jnp.arange(n_stream))
        return out
    out = run(Tcw0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(Tcw0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (reps * n_stream)
    print(f"{label}: {dt*1e3:.3f} ms/frame")
    return dt


timeit(make_step(), "full step                 ")
timeit(make_step(do_pose=False), "no pose opt               ")
timeit(make_step(do_pose=False, do_dup=False), "no pose, no dedup         ")
timeit(make_step(do_pose=False, do_dup=False, do_bird=False), "extract + front match only")
timeit(make_step(do_pose=False, do_dup=False, do_bird=False, do_match=False), "extract only              ")
