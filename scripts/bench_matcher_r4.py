"""Fused-matcher kernel DEVICE timing: the kernel runs inside one scanned
dispatch over varied inputs (tunnel round-trip latency ~3.5 ms/call and result
dedupe both excluded) — updates the STATUS per-kernel MFU table (r4)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend())

from fishbirdeyevisualslam_tpu.ops import pallas_matcher

PEAK = 394e12  # v5e bf16 FLOP/s
R = 64         # scanned kernel invocations per dispatch


def run(NA, NB, label, dual=False, level_window=True, tile_b=1024):
    rng = np.random.RandomState(0)
    pa = jnp.asarray(rng.choice([-1.0, 1.0], (NA, 256))).astype(jnp.bfloat16)
    pb = jnp.asarray(rng.choice([-1.0, 1.0], (NB, 256))).astype(jnp.bfloat16)
    uvb = jnp.asarray(rng.uniform(0, 900, (NB, 2)).astype(np.float32))
    octa = jnp.asarray(rng.randint(0, 8, NA).astype(np.int32))
    predb = jnp.asarray(rng.randint(0, 8, NB).astype(np.float32))
    va = jnp.ones((NA,), bool)
    vb = jnp.ones((NB,), bool)
    rb = jnp.full((NB,), 50.0, jnp.float32)
    uvas = jnp.asarray(rng.uniform(0, 900, (R, NA, 2)).astype(np.float32))

    if dual:
        def one(uva):
            r1, r2 = pallas_matcher.fused_projection_match_dual(
                pa, uva, octa, va, pb, uvb, rb, predb, vb, max_dist=100.0,
                level_window=level_window)
            return jnp.sum(r1.dist * (r1.dist < 1e8)) + jnp.sum(r2.idx)
    else:
        def one(uva):
            r = pallas_matcher.fused_projection_match(
                pa, uva, octa, va, pb, uvb, rb, predb, vb, max_dist=100.0,
                level_window=level_window, tile_b=tile_b)
            return jnp.sum(r.dist * (r.dist < 1e8)) + jnp.sum(r.idx)

    @jax.jit
    def sweep(uvas):
        def body(acc, uva):
            return acc + one(uva), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), uvas)
        return acc

    jax.block_until_ready(sweep(uvas))
    t0 = time.perf_counter()
    out = sweep(uvas + 0.001)  # varied vs warmup
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R
    fl = 2.0 * NA * NB * 256
    print(f"{label:42s} {dt*1e3:7.3f} ms  {fl/dt/1e12:6.1f} TFLOP/s "
          f"({fl/dt/PEAK:5.1%} of v5e bf16 peak)")


run(2048, 16384, "single (local map, level win, tb=1024)")
run(2048, 16384, "single no-level-window tb=2048", level_window=False, tile_b=2048)
run(2048, 16384, "dual (motion model, 2 radii)", dual=True)
run(2048, 8192, "single bird-map size", level_window=False, tile_b=2048)
run(2048, 4096, "single at compact cap 4096", level_window=False, tile_b=2048)
run(2048, 4096, "dual at compact cap 4096", dual=True)
run(2048, 2048, "single bird compact 2048", level_window=False, tile_b=2048)
