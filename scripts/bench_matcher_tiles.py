"""Tile-size sweep for the fused MXU projection-match kernel (real TPU)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend())

from fishbirdeyevisualslam_tpu.ops.pallas_matcher import fused_projection_match
from fishbirdeyevisualslam_tpu.ops import matcher

NA, NB = 2048, 16384
rng = np.random.RandomState(0)
pm1_a = jnp.asarray(rng.choice([-1.0, 1.0], (NA, 256)).astype(np.float32)).astype(jnp.bfloat16)
pm1_b = jnp.asarray(rng.choice([-1.0, 1.0], (NB, 256)).astype(np.float32)).astype(jnp.bfloat16)
uv_a = jnp.asarray(rng.uniform(0, 900, (NA, 2)).astype(np.float32))
uv_b = jnp.asarray(rng.uniform(0, 900, (NB, 2)).astype(np.float32))
oct_a = jnp.zeros((NA,), jnp.int32)
valid_a = jnp.ones((NA,), bool)
valid_b = jnp.ones((NB,), bool)
radius = jnp.full((NB,), 15.0, jnp.float32)
pred = jnp.zeros((NB,), jnp.float32)


def timeit(fn, label, n_stream=64, reps=3):
    @jax.jit
    def run(x):
        def body(c, i):
            res = fn(c + i.astype(jnp.float32) * 0)
            return c + jnp.sum(res.dist) * 1e-20, 0
        out, _ = jax.lax.scan(body, x, jnp.arange(n_stream))
        return out
    out = run(jnp.float32(0.)); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(jnp.float32(0.))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (reps * n_stream)
    print(f"{label}: {dt*1e3:.3f} ms")
    return dt


ref = None
for ta, tb in ((256, 512), (1024, 1024), (1024, 2048), (512, 2048),
               (2048, 512), (1024, 4096)):
    def fn(c, ta=ta, tb=tb):
        return fused_projection_match(
            pm1_a, uv_a + c, oct_a, valid_a, pm1_b, uv_b,
            radius, pred, valid_b, max_dist=100.0, tile_a=ta, tile_b=tb)
    try:
        out = fn(jnp.float32(0.))
        if ref is None:
            ref = (np.asarray(out.idx), np.asarray(out.dist))
        else:
            same = (np.asarray(out.idx) == ref[0]).mean()
            assert same > 0.999, f"idx mismatch {same}"
        timeit(fn, f"tile ({ta:5d},{tb:5d})")
    except Exception as e:
        print(f"tile ({ta},{tb}): FAILED {type(e).__name__}: {str(e)[:120]}")
