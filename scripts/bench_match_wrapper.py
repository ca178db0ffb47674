"""Isolate fused-match wrapper overhead: kernel with pre-padded operands vs the
full wrapper with per-frame A-side prep (as in the real tracking step)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend())

from fishbirdeyevisualslam_tpu.ops import pallas_matcher as pm

NA, NB = 2048, 16384
rng = np.random.RandomState(0)
a_bits = rng.choice([-1.0, 1.0], (NA, 256)).astype(np.float32)
b_bits = rng.choice([-1.0, 1.0], (NB, 256)).astype(np.float32)
a = jnp.asarray(a_bits).astype(jnp.bfloat16)
b = jnp.asarray(b_bits).astype(jnp.bfloat16)
a_aux = jnp.zeros((NA, 4), jnp.float32).at[:, 2].set(1.0).at[:, 3].set(1.0)
b_aux = jnp.zeros((NB, 4), jnp.float32).at[:, 2].set(1e6)
uv_a = jnp.zeros((NA, 2), jnp.float32)
oct_a = jnp.zeros((NA,), jnp.int32)
valid_a = jnp.ones((NA,), bool)
uv_b = jnp.zeros((NB, 2), jnp.float32)
valid_b = jnp.ones((NB,), bool)
radius = jnp.full((NB,), 1e6, jnp.float32)
pred = jnp.zeros((NB,), jnp.float32)

TA, TB = pm.PROJ_TILE_A, pm.PROJ_TILE_B
grid = (NA // TA, NB // TB)
kernel = functools.partial(pm._proj_match_kernel, level_window=False)

@jax.jit
def raw_kernel(a, a_aux, b, b_aux):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NA, 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TA, 256), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TA, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 256), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TA, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(a, a_aux, b, b_aux)


def timeit(fn, label, args, vary=0, n_stream=64, reps=3):
    @jax.jit
    def run(x):
        def body(c, i):
            aa = list(args)
            aa[vary] = aa[vary] + c * 0  # keep a data dependence on the carry
            out = fn(*aa)
            out0 = out[0] if isinstance(out, tuple) else out
            if hasattr(out0, "dist"):
                return c + jnp.sum(out0.dist) * 1e-20, 0
            return c + jnp.sum(out0) * 1e-20, 0
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


timeit(raw_kernel, "raw kernel (pre-padded)       ", (a, a_aux, b, b_aux), vary=1)
timeit(lambda *args: pm.fused_projection_match(*args, max_dist=100.0),
       "wrapper (A varies per frame)  ",
       (a, uv_a, oct_a, valid_a, b, uv_b, radius, pred, valid_b), vary=1)
# same but varying the f32 source descriptors (simulates fresh extraction output)
a_f32 = jnp.asarray(a_bits)
timeit(lambda af, *args: pm.fused_projection_match(af.astype(jnp.bfloat16), *args, max_dist=100.0),
       "wrapper (A from f32 conversion)",
       (a_f32, uv_a, oct_a, valid_a, b, uv_b, radius, pred, valid_b), vary=0)
