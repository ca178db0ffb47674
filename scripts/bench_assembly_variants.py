"""On-chip A/B of camera-system assembly variants (chunk size, layout)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K, P, M = 256, 16384, 16
rng = np.random.RandomState(0)
kf_idx = jnp.asarray(rng.randint(0, K, (P, M)), jnp.int32)
Hc_diag = jnp.asarray(rng.randn(P, M, 36), jnp.float32)
bc_pm = jnp.asarray(rng.randn(P, M, 6), jnp.float32)
T = jnp.asarray(rng.randn(P, M, 6, 3), jnp.float32)
Hcp = jnp.asarray(rng.randn(P, M, 6, 3), jnp.float32)


def assemble(C, kf_idx, Hc_diag, bc_pm, T, Hcp):
    nc = P // C
    xs = (kf_idx.reshape(nc, C, M), Hc_diag.reshape(nc, C, M, 36),
          bc_pm.reshape(nc, C, M, 6), T.reshape(nc, C, M, 18),
          Hcp.reshape(nc, C, M, 18))

    def body(carry, xs):
        pair, diag, bc = carry
        kf, Hd, bcm, Tm, Hp = xs
        O = (kf[..., None] == jnp.arange(K)).astype(Tm.dtype)
        diag = diag + jnp.einsum("cmk,cmx->kx", O, Hd)
        bc = bc + jnp.einsum("cmk,cmx->kx", O, bcm)
        U = jnp.einsum("cmk,cmx->ckx", O, Tm)
        V = jnp.einsum("cmk,cmx->ckx", O, Hp)
        A = U.reshape(C, K, 6, 3).transpose(1, 2, 0, 3).reshape(K * 6, C * 3)
        B = V.reshape(C, K, 6, 3).transpose(1, 2, 0, 3).reshape(K * 6, C * 3)
        return (pair + A @ B.T, diag, bc), None

    init = (jnp.zeros((K * 6, K * 6)), jnp.zeros((K, 36)), jnp.zeros((K, 6)))
    (pair, diag, bc), _ = jax.lax.scan(body, init, xs)
    return pair, diag, bc


def assemble_flat(C, kf_idx, Hc_diag, bc_pm, T, Hcp):
    """Flatten (P,M) -> N obs; one-hot over obs axis; no scan when C==N."""
    N = P * M
    kf = kf_idx.reshape(N)
    Hd = Hc_diag.reshape(N, 36)
    bcm = bc_pm.reshape(N, 6)
    # pair term still needs per-point grouping -> keep (P,M) for U/V
    O = (kf[:, None] == jnp.arange(K)).astype(T.dtype)  # (N,K)
    diag = O.T @ Hd
    bc = O.T @ bcm
    Og = O.reshape(P, M, K)
    U = jnp.einsum("pmk,pmx->pkx", Og, T.reshape(P, M, 18))
    V = jnp.einsum("pmk,pmx->pkx", Og, Hcp.reshape(P, M, 18))
    A = U.reshape(P, K, 6, 3).transpose(1, 2, 0, 3).reshape(K * 6, P * 3)
    B = V.reshape(P, K, 6, 3).transpose(1, 2, 0, 3).reshape(K * 6, P * 3)
    return A @ B.T, diag, bc


def timeit(f, name, reps=5):
    """Varied inputs per rep: the tunnel backend dedupes identical runs."""
    outs = jax.block_until_ready(f(T, kf_idx))
    Ts = [T + 1e-6 * (r + 1) for r in range(reps)]
    t0 = time.perf_counter()
    outs = [f(t, kf_idx) for t in Ts]
    jax.block_until_ready(outs)
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1e3:9.2f} ms")


for C in (1024, 4096):
    f = jax.jit(lambda T, kf, C=C: assemble(C, kf, Hc_diag, bc_pm, T, Hcp))
    timeit(f, f"scan chunks C={C}")
f2 = jax.jit(lambda T, kf: assemble_flat(P, kf, Hc_diag, bc_pm, T, Hcp))
timeit(f2, "flat no-chunk")
with jax.default_matmul_precision("default"):
    f3 = jax.jit(lambda T, kf: assemble(1024, kf, Hc_diag, bc_pm, T, Hcp))
    timeit(f3, "scan C=1024 default-precision")
    f4 = jax.jit(lambda T, kf: assemble_flat(P, kf, Hc_diag, bc_pm, T, Hcp))
    timeit(f4, "flat default-precision")
