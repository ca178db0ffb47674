"""Micro-bench the candidate-compaction pieces at P=32768: nonzero vs gather
vs the packed-prefix alternative, to pick the r5 restructure."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), flush=True)

P = 32768
CAP = 4096
rng = np.random.RandomState(0)
vis = jnp.asarray(rng.rand(P) < 0.06)          # ~2k visible
desc = jnp.asarray(rng.choice([-1.0, 1.0], (P, 256)).astype(np.float32), jnp.bfloat16)
uv = jnp.asarray(rng.rand(P, 2).astype(np.float32))
r = jnp.asarray(rng.rand(P).astype(np.float32))
pred = jnp.asarray(rng.randint(0, 8, P).astype(np.int32))


def timeit(label, fn, *args, R=64):
    @jax.jit
    def sweep(x0):
        def body(c, i):
            out = fn(c, *args)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return c + s * 1e-30, None
        c, _ = jax.lax.scan(body, x0, jnp.arange(R))
        return c
    jax.block_until_ready(sweep(jnp.float32(0.0)))
    t0 = time.perf_counter()
    outs = [sweep(jnp.float32(k + 1)) for k in range(3)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (3 * R)
    print(f"  {label:46s} {dt*1e3:8.4f} ms", flush=True)


def nz(eps, vis):
    v = vis ^ (eps > 1e9)
    return jnp.nonzero(v, size=CAP, fill_value=P - 1)[0].astype(jnp.int32)
timeit("nonzero(size=4096) over 32768", nz, vis)

sel = jnp.nonzero(vis, size=CAP, fill_value=P - 1)[0].astype(jnp.int32)

def gat(eps, sel):
    s = sel + (eps > 1e9).astype(jnp.int32)
    return desc[s]
timeit("gather desc (4096, 256) bf16", gat, sel)

def gat_aux(eps, sel):
    s = sel + (eps > 1e9).astype(jnp.int32)
    return uv[s], r[s], pred[s]
timeit("gather aux (uv, r, pred)", gat_aux, sel)

def gat_all(eps, sel):
    s = sel + (eps > 1e9).astype(jnp.int32)
    return desc[s], uv[s], r[s], pred[s]
timeit("gather desc+aux", gat_all, sel)

def take_desc(eps, sel):
    s = sel + (eps > 1e9).astype(jnp.int32)
    return jnp.take(desc, s, axis=0, indices_are_sorted=True)
timeit("take sorted desc", take_desc, sel)

# one-hot matmul alternative for the desc gather: (CAP,P)x(P,256)
def onehot_desc(eps, sel):
    s = sel + (eps > 1e9).astype(jnp.int32)
    O = (s[:, None] == jnp.arange(P)[None, :]).astype(jnp.bfloat16)
    return O @ desc
timeit("one-hot matmul desc gather", onehot_desc, sel)

# full gate precompute as in _project_front_gates (approximate op mix)
def gates(eps, uv):
    pc = uv[:, 0] * 2.0 + eps
    d = jnp.sqrt(jnp.maximum(pc * pc + uv[:, 1] ** 2, 1e-6))
    pr = jnp.clip(jnp.ceil(jnp.log(jnp.maximum(r, 1e-6) / d) / 0.18), 0, 7)
    v = vis & (pc > 0.1) & (d > 0.2)
    return v, pr
timeit("cheap gate mix over 32768", gates, uv)


def cumsum_only(eps, vis):
    v = vis ^ (eps > 1e9)
    return jnp.cumsum(v.astype(jnp.int32))
timeit("cumsum over 32768", cumsum_only, vis)

def sorted_compact(eps, vis):
    v = vis ^ (eps > 1e9)
    key = jnp.where(v, jnp.arange(P, dtype=jnp.int32), P)
    return jax.lax.sort(key)[:CAP]
timeit("sort-based compaction", sorted_compact, vis)

def searchsorted_compact(eps, vis):
    v = vis ^ (eps > 1e9)
    cs = jnp.cumsum(v.astype(jnp.int32))
    return jnp.searchsorted(cs, jnp.arange(CAP, dtype=jnp.int32) + 1).astype(jnp.int32)
timeit("cumsum+searchsorted compaction", searchsorted_compact, vis)

def blocky(eps, vis):
    # hierarchical: 256 blocks of 128; per-block scatter replaced by a
    # per-block sort of 128-wide rows (vectorized across blocks)
    v = vis ^ (eps > 1e9)
    vb = v.reshape(256, 128)
    key = jnp.where(vb, jnp.arange(128, dtype=jnp.int32)[None, :], 128)
    loc = jax.lax.sort(key, dimension=1)  # (256,128) packed local idx
    cnt = jnp.sum(vb.astype(jnp.int32), axis=1)
    off = jnp.cumsum(cnt) - cnt
    return loc, off
timeit("blockwise sort (256x128) + offsets", blocky, vis)
