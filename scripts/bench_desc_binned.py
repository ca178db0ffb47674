"""Prototype: bin-grouped rBRIEF matmul vs full-bin matmul (TPU)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend())

from fishbirdeyevisualslam_tpu.ops import orb

N = 2048
NB = orb.N_ANGLE_BINS
CAP = 512
rng = np.random.RandomState(0)
patches37 = jnp.asarray(rng.rand(N, 37, 37).astype(np.float32) * 255)
angles = jnp.asarray(rng.rand(N).astype(np.float32) * 2 * np.pi)


def binned(patches37, angles, cap=CAP):
    n = patches37.shape[0]
    flat = patches37.reshape(n, -1).astype(jnp.bfloat16)
    S = jnp.asarray(orb._blur_folded_tables(NB), jnp.bfloat16)
    S_b = S.reshape(-1, NB, orb.N_BITS).transpose(1, 0, 2)  # (NB, 1369, 256)
    bin_id = orb.quantize_angle_bin(angles, NB)
    onehot = (bin_id[:, None] == jnp.arange(NB)[None, :]).astype(jnp.int32)
    rank = jnp.cumsum(onehot, axis=0)[jnp.arange(n), bin_id] - 1
    ok = rank < cap
    slot = jnp.where(ok, rank, cap - 1)
    grid = jnp.zeros((NB, cap, flat.shape[1]), jnp.bfloat16)
    grid = grid.at[bin_id, slot].set(jnp.where(ok[:, None], flat, 0))
    D = jax.lax.dot_general(
        grid, S_b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (NB, cap, 256)
    desc = D[bin_id, slot]
    return (desc > 0).astype(jnp.uint8), ok


def timeit(fn, label, n_stream=64, reps=3):
    @jax.jit
    def run(x):
        def body(c, i):
            out = fn(patches37 + c * 0 + i.astype(jnp.float32) * 0, angles)
            b = out[0] if isinstance(out, tuple) else out
            return c + jnp.sum(b[0]).astype(jnp.float32) * 1e-20, 0
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


b_full = orb.descriptors_from_raw37(patches37, angles)
b_bin, ok = binned(patches37, angles)
mismatch = np.mean(np.asarray(b_full) != np.asarray(b_bin))
print(f"overflow drops: {int((~np.asarray(ok)).sum())}  bit mismatch: {mismatch:.5f}")

timeit(orb.descriptors_from_raw37, "full-bin matmul ")
timeit(binned, "bin-grouped     ")

# MEASURED (v5e, N=2048, cap=512): full-bin 0.517 ms vs bin-grouped 0.473 ms
# with exact bit parity and zero drops on uniform angles.  The 8x MXU-FLOP
# saving is eaten by the scatter (grid build) + row-gather (result selection),
# so the bin-grouped path is NOT integrated; kept as a recorded negative
# result.  The full-bin matmul runs at ~95% of bf16 peak per the device trace.
