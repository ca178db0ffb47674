"""Per-phase device timing of the tracking step (streamed, host out of loop)."""
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
Tcw = se3.identity()

def stream_timer(body, label, n_stream=32, reps=3):
    @jax.jit
    def run(x):
        def f(carry, i):
            return body(carry, i), 0
        out, _ = jax.lax.scan(f, x, jnp.arange(n_stream))
        return out
    out = run(jnp.float32(0.)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(jnp.float32(0.))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (reps * n_stream)
    print(f"{label}: {dt*1e3:.3f} ms/frame")
    return dt

# phase 1: front extraction
def extract_front(c, i):
    kp = features._extract_impl(front_img + i.astype(jnp.float32) + c, cfg.orb, nf)
    return c + jnp.sum(kp.xy[0]) * 1e-20
t_ef = stream_timer(extract_front, "front extract     ")

# phase 2: bird extraction
def extract_bird(c, i):
    kp = features._extract_impl(bird_img + i.astype(jnp.float32) + c, cfg.orb, nf)
    return c + jnp.sum(kp.xy[0]) * 1e-20
t_eb = stream_timer(extract_bird, "bird extract      ")

# phase 3: undistort + matching (reuse fixed keypoints)
kp0 = features._extract_impl(front_img, cfg.orb, nf)
bkp0 = features._extract_impl(bird_img, cfg.orb, nf)
uv0 = cam_ops.undistort_fisheye(cam, kp0.xy)

def match_front(c, i):
    pc = se3.transform(Tcw, map_pos)
    uv_proj = cam_ops.project_pinhole(cam, pc) + c
    vis = (pc[:, 2] > 0.1)
    compat = matcher.window_mask(uv0 + i.astype(jnp.float32) * 0, uv_proj, 15.0) & kp0.valid[:, None] & vis[None, :]
    res = matcher.match(kp0.desc_pm1, map_pm1, compat, max_dist=100.0)
    res = matcher.resolve_duplicates(res, P)
    return c + jnp.sum(res.dist) * 1e-20
t_m = stream_timer(match_front, "front match (xla) ")

from fishbirdeyevisualslam_tpu.ops.pallas_matcher import fused_projection_match

def match_front_fused(c, i):
    pc = se3.transform(Tcw, map_pos)
    uv_proj = cam_ops.project_pinhole(cam, pc) + c
    vis = (pc[:, 2] > 0.1)
    res = fused_projection_match(
        kp0.desc_pm1, uv0, kp0.level, kp0.valid,
        map_pm1, uv_proj, jnp.float32(15.0), jnp.zeros((P,), jnp.float32), vis,
        max_dist=100.0)
    res = matcher.resolve_duplicates(res, P)
    return c + jnp.sum(res.dist) * 1e-20
t_mf = stream_timer(match_front_fused, "front match (mxu fused)")

def undistort(c, i):
    uv = cam_ops.undistort_fisheye(cam, kp0.xy + c)
    return c + jnp.sum(uv) * 1e-20
t_u = stream_timer(undistort, "fisheye undistort ")

# phase 4: pose opt (observation count = extracted keypoint count)
n_obs = uv0.shape[0]
front = FrontObs(Xw=map_pos[:n_obs], uv=uv0, inv_sigma2=jnp.ones(n_obs), valid=jnp.ones(n_obs, bool))
bird = BirdObs(Xw=bp_pos[:n_obs], Xc=bp_pos[:n_obs], inv_sigma2=jnp.ones(n_obs), valid=jnp.ones(n_obs, bool))

def pose(c, i):
    out = pose_optimization(cam, cfg.ba, Tcw + c * 0, front, bird)
    return c + jnp.sum(out.Tcw) * 1e-20
t_p = stream_timer(pose, "pose opt (fused)  ")

print(f"sum of phases: {(t_ef+t_eb+t_m+t_u+t_p)*1e3:.3f} ms")
