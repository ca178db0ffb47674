import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend())

from fishbirdeyevisualslam_tpu.ops import matcher, pallas_matcher
from fishbirdeyevisualslam_tpu.slam.frame import desc_pm1_from_packed

NA, NB = 2048, 16384
rng = np.random.RandomState(0)
da = jnp.asarray(rng.randint(0, 2**32, (NA, 8), dtype=np.uint64).astype(np.uint32))
db = jnp.asarray(rng.randint(0, 2**32, (NB, 8), dtype=np.uint64).astype(np.uint32))
pa = desc_pm1_from_packed(da)
pb = desc_pm1_from_packed(db)
uva = jnp.asarray(rng.uniform(0, 900, (NA, 2)).astype(np.float32))
uvb = jnp.asarray(rng.uniform(0, 900, (NB, 2)).astype(np.float32))
octa = jnp.asarray(rng.randint(0, 8, NA).astype(np.int32))
predb = jnp.zeros((NB,), jnp.float32)
va = jnp.ones((NA,), bool)
vb = jnp.ones((NB,), bool)
rb = jnp.full((NB,), 50.0, jnp.float32)

def timeit(fn, label, reps=30):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.3f} ms")

@jax.jit
def xla_match(pa, pb, uva, uvb):
    compat = matcher.window_mask(uva, uvb, 50.0)
    return matcher.match(pa, pb, compat, max_dist=100.0)

@jax.jit
def fused_mxu(pa, uva, octa, va, pb, uvb, rb, predb, vb):
    return pallas_matcher.fused_projection_match(
        pa, uva, octa, va, pb, uvb, rb, predb, vb, max_dist=100.0)

@jax.jit
def fused_pop(da, uva, db, uvb, vb):
    return pallas_matcher.fused_masked_match(da, uva, db, uvb, vb, 50.0)

timeit(lambda: xla_match(pa, pb, uva, uvb), "xla matmul+topk  ")
timeit(lambda: fused_mxu(pa, uva, octa, va, pb, uvb, rb, predb, vb), "fused mxu kernel ")
timeit(lambda: fused_pop(da, uva, db, uvb, vb), "fused popcount   ")
