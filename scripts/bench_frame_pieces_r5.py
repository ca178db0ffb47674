"""r5: attribute the 255->215 fps bench regression to per-frame pieces that
scale with STORE capacity (P=32768 / PB=16384) instead of the active window.

Times each suspect sub-program scanned (64 iters/dispatch, varied inputs) on
the selected backend, at the shipped capacities and at the r3 capacities, so
the delta names the culprits.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), flush=True)

from fishbirdeyevisualslam_tpu.config import SystemConfig, CapacityConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.slam import map_state as ms, tracking as tr
from fishbirdeyevisualslam_tpu.slam.frame import build_frame
import dataclasses


def make_state(cfg):
    cap = cfg.capacity
    rng = np.random.RandomState(0)
    m = ms.empty_map(cfg)
    P, PB = cap.max_points, cap.max_bird_points
    K = min(cap.max_keyframes, 32)
    m = m._replace(
        mp_pos=jnp.asarray(np.stack([
            rng.uniform(-10, 10, P), rng.uniform(-5, 5, P), rng.uniform(5, 40, P)
        ], -1).astype(np.float32)),
        mp_desc=jnp.asarray(rng.randint(0, 2**32, (P, 8), dtype=np.uint64).astype(np.uint32)),
        mp_desc_pm1=jnp.asarray(rng.choice([-1.0, 1.0], (P, 256)).astype(np.float32), jnp.bfloat16),
        mp_valid=jnp.ones((P,), bool),
        mp_max_dist=jnp.full((P,), 60.0),
        mp_min_dist=jnp.full((P,), 1.0),
        bp_pos=jnp.asarray(np.stack([
            rng.uniform(0, 25, PB), rng.uniform(-12, 12, PB), np.zeros(PB)
        ], -1).astype(np.float32)),
        bp_desc=jnp.asarray(rng.randint(0, 2**32, (PB, 8), dtype=np.uint64).astype(np.uint32)),
        bp_desc_pm1=jnp.asarray(rng.choice([-1.0, 1.0], (PB, 256)).astype(np.float32), jnp.bfloat16),
        bp_valid=jnp.ones((PB,), bool),
        kf_valid=m.kf_valid.at[:K].set(True),
        kf_seq=m.kf_seq.at[:K].set(jnp.arange(K)),
        n_kf=jnp.int32(K), kf_counter=jnp.int32(K),
        obs_kf=m.obs_kf.at[:3072, 0].set(jnp.arange(3072, dtype=jnp.int32) % K),
        obs_valid=m.obs_valid.at[:3072, 0].set(True),
    )
    cam = cfg.camera
    front_img = jnp.asarray(rng.rand(cam.height, cam.width).astype(np.float32) * 255)
    bird_img = jnp.asarray(rng.rand(cfg.bird.rows, cfg.bird.cols).astype(np.float32) * 255)
    bmask = jnp.ones((cfg.bird.rows, cfg.bird.cols), jnp.float32) * 255
    f0 = build_frame(front_img, bird_img, bmask, jnp.zeros(3), jnp.asarray(0.0),
                     cfg, cap.max_front_kp, None, cap.max_bird_kp)
    f_last = f0._replace(odom=jnp.asarray([-0.3, 0.0, 0.0]))
    last_bp = jnp.full((cap.max_bird_kp,), -1, jnp.int32)
    # production-shaped candidate ID LIST (see SlamSystem._track_ok)
    cand_idx = rng.choice(P, cap.max_front_kp, replace=False).astype(np.int32)
    cand_np = np.full(2 * cap.max_front_kp, -1, np.int32)
    cand_np[::2] = cand_idx
    cand = jnp.asarray(cand_np)
    assoc = jnp.where(jnp.arange(cap.max_front_kp) % 3 == 0,
                      jnp.arange(cap.max_front_kp, dtype=jnp.int32), -1)
    return m, f0, f_last, last_bp, cand, assoc


def timeit(label, fn, *args, R=64):
    """Scan fn R times with a varied scalar folded in; report ms/iter."""
    @jax.jit
    def sweep(seed):
        def body(c, i):
            out = fn(c + i.astype(jnp.float32) * 1e-6, *args)
            # reduce output to a scalar carry to serialize iterations
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l).astype(jnp.float32) if l.dtype != jnp.bool_
                    else jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return c + s * 1e-30, None
        c, _ = jax.lax.scan(body, seed, jnp.arange(R))
        return c
    jax.block_until_ready(sweep(jnp.float32(0.0)))
    t0 = time.perf_counter()
    outs = [sweep(jnp.float32(r + 1)) for r in range(3)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (3 * R)
    print(f"  {label:42s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def run(cfg, tag):
    print(f"== {tag}: P={cfg.capacity.max_points} PB={cfg.capacity.max_bird_points}",
          flush=True)
    m, f0, f_last, last_bp, cand, assoc = make_state(cfg)
    Tcw = se3.identity()

    def full(eps):
        T = Tcw.at[4].add(eps)
        return tr.track_frame_core(m, f0, cfg, T, cand, jnp.int32(0),
                                   tr.bird_only_view(f_last), last_bp, T,
                                   jnp.asarray(True)).scalars
    timeit("track_frame_core (full)", full)

    cand_mask = jnp.zeros((m.mp_pos.shape[0],), bool).at[
        jnp.clip(cand, 0, m.mp_pos.shape[0] - 1)].set(cand >= 0)

    def gates(eps):
        T = Tcw.at[4].add(eps)
        return tr._project_front_gates(m, cfg, T, cand_mask, True)
    timeit("_project_front_gates (x1)", gates)

    def lmm(eps):
        return tr.local_map_mask(m, jnp.where(assoc >= 0, assoc, -1), cfg)
    timeit("local_map_mask", lmm)

    def blm(eps):
        T = Tcw.at[4].add(eps)
        return tr.bird_local_mask(m, cfg, T)
    timeit("bird_local_mask (x1)", blm)

    def cullb(eps):
        T = Tcw.at[4].add(eps)
        return tr.cull_bird_points(m, cfg, T).bp_valid
    timeit("cull_bird_points", cullb)

    def maint(eps):
        T = Tcw.at[4].add(eps)
        return tr.bird_frame_maintenance(
            m, f0, cfg, tr.bird_only_view(f_last), last_bp, T, jnp.int32(0),
            jnp.full_like(last_bp, -1), jnp.asarray(True))[1]
    timeit("bird_frame_maintenance", maint)

    def nref(eps):
        nobs = ms.point_obs_count(m)
        rp = m.kf_mp[0]
        P = m.mp_pos.shape[0]
        rp_ok = (rp >= 0) & m.mp_valid[jnp.clip(rp, 0, P - 1)]
        robs = nobs[jnp.clip(rp, 0, P - 1)]
        return jnp.sum((rp_ok & (robs >= 3)).astype(jnp.int32)) + eps
    timeit("point_obs_count + nref", nref)

    def bookkeep(eps):
        P = m.mp_pos.shape[0]
        mp_fin = assoc
        found_pid = jnp.clip(mp_fin, 0, P - 1)
        # full-store visible-counter update (vis2 & pt_local in the core)
        vis2 = jnp.zeros((P,), bool).at[found_pid].set(mp_fin >= 0)
        mp_visible = m.mp_visible + vis2.astype(jnp.int32)
        mp_found = m.mp_found.at[jnp.where(mp_fin >= 0, found_pid, P - 1)].add(
            (mp_fin >= 0).astype(jnp.int32))
        return mp_visible.sum() + mp_found.sum() + eps
    timeit("found/visible bookkeeping", bookkeep)


if __name__ == "__main__":
    base = SystemConfig()
    run(base, "r4 shipped")
    old = base.replace(capacity=dataclasses.replace(
        base.capacity, max_points=16384, max_bird_points=8192))
    run(old, "r3 capacities")
