"""Sub-phase device timing of ORB extraction (pyramid / FAST / top-k / patches /
descriptors), streamed like bench_phases.py."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend())

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.ops import features, fast as fast_ops, image as image_ops, orb as orb_ops

cfg = SystemConfig()
ocfg = cfg.orb
cam = cfg.camera
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(cam.height, cam.width).astype(np.float32) * 255)
nf = ocfg.n_features
budgets = image_ops.per_level_budget(nf, ocfg.n_levels, ocfg.scale_factor)


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


# 1) pyramid
def pyr_fn(c, i):
    pyr = image_ops.build_pyramid(img + c, ocfg.n_levels, ocfg.scale_factor)
    return c + sum(jnp.sum(p[0, :1]) for p in pyr) * 1e-20
t1 = stream_timer(pyr_fn, "pyramid          ")

pyr0 = image_ops.build_pyramid(img, ocfg.n_levels, ocfg.scale_factor)

# 2) FAST detect (all levels)
def fast_fn(c, i):
    s = 0.0
    for lvl in range(ocfg.n_levels):
        sc, raw = fast_ops.detect(pyr0[lvl] + c, float(ocfg.ini_th_fast),
                                  float(ocfg.min_th_fast), with_raw=True)
        s = s + jnp.sum(sc[0, :1])
    return c + s * 1e-20
t2 = stream_timer(fast_fn, "FAST (8 levels)  ")

# 3) grid top-k (all levels)
scores = [fast_ops.detect(pyr0[l], float(ocfg.ini_th_fast), float(ocfg.min_th_fast))
          for l in range(ocfg.n_levels)]
def topk_fn(c, i):
    s = 0.0
    for lvl in range(ocfg.n_levels):
        yx, v = features._select_grid_topk(scores[lvl] + c * 0, budgets[lvl],
                                           ocfg.grid_cell, orb_ops.HALF + 1)
        s = s + jnp.sum(yx[0]) + jnp.sum(v[0])
    return c + s * 1e-20
t3 = stream_timer(topk_fn, "grid top-k       ")

# 4) patches + blur + orientation + descriptors (all levels)
sel = [features._select_grid_topk(scores[l], budgets[l], ocfg.grid_cell,
                                  orb_ops.HALF + 1) for l in range(ocfg.n_levels)]
def desc_fn(c, i):
    s = 0.0
    pad = orb_ops.HALF + features._BLUR_R
    side = orb_ops.PATCH + 2 * features._BLUR_R
    for lvl in range(ocfg.n_levels):
        img_p = jnp.pad(pyr0[lvl] + c, ((pad, pad), (pad, pad)), mode="edge")
        yx = sel[lvl][0]
        if jax.default_backend() == "tpu":
            from fishbirdeyevisualslam_tpu.ops.pallas_patch import extract_patches
            patches37 = extract_patches(img_p, yx, side)
        else:
            patches37 = jax.vmap(
                lambda p: jax.lax.dynamic_slice(img_p, (p[0], p[1]), (side, side))
            )(yx)
        patches = patches37[:, features._BLUR_R: features._BLUR_R + orb_ops.PATCH,
                            features._BLUR_R: features._BLUR_R + orb_ops.PATCH]
        b = features._blur_patches(patches37)
        ang = orb_ops.orientations(patches)
        bits = orb_ops.descriptors(b, ang)
        s = s + jnp.sum(bits[0]) + jnp.sum(ang[0])
    return c + s * 1e-20
t4 = stream_timer(desc_fn, "patch+orb+desc   ")

print(f"sum: {(t1+t2+t3+t4)*1e3:.3f} ms (full extract measured separately)")

def full_fn(c, i):
    kp = features._extract_impl(img + c, ocfg, nf)
    return c + jnp.sum(kp.xy[0]) * 1e-20
stream_timer(full_fn, "full extract     ")
