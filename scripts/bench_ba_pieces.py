"""Per-piece on-chip timing of the BA solver at global sizes (K=256, P=16384).

Breaks bundle_adjust into its constituent device programs and times each,
to locate the dominant cost (VERDICT r3 next #2: GBA must reach <= 1 s)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.slam.loop_closing import map_point_blocks
from fishbirdeyevisualslam_tpu.slam.tracking import odom_chain_edges
from fishbirdeyevisualslam_tpu.solvers import ba as ba_mod
from fishbirdeyevisualslam_tpu.solvers.ba import bundle_adjust
from scripts.bench_scaling import make_realistic_map


def timeit(fn, *args, reps=5, name=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:32s} {dt*1e3:9.2f} ms")
    return dt


def main():
    cfg = SystemConfig()
    m = make_realistic_map(cfg)
    front, bird = map_point_blocks(m, cfg)
    odom = odom_chain_edges(m, cfg, m.kf_valid)
    poses0 = m.kf_Tcw
    fixed = (~m.kf_valid) | (jnp.arange(m.K) == 0)
    K = m.K
    ba = cfg.ba
    cam = cfg.camera

    f_act = (front.valid & front.point_valid[:, None]).astype(jnp.float32)
    b_act = (bird.valid & bird.point_valid[:, None]).astype(jnp.float32)

    @jax.jit
    def fam_front(poses):
        return ba_mod._family_terms(cam, poses, front, ba.w_front,
                                    ba.huber_delta, True, f_act, True)

    @jax.jit
    def fam_bird(poses):
        return ba_mod._family_terms(None, poses, bird, ba.w_bird,
                                    ba.huber_delta, True, b_act, False)

    e_f, Jc_f, Jp_f, w_f, _ = jax.block_until_ready(fam_front(poses0))
    e_b, Jc_b, Jp_b, w_b, _ = jax.block_until_ready(fam_bird(poses0))

    @jax.jit
    def acc_front(poses, e, Jc, Jp, w):
        return ba_mod._accumulate_family(K, poses, e, Jc, Jp, w, front.kf_idx,
                                         jnp.float32(1e-4))

    @jax.jit
    def acc_bird(poses, e, Jc, Jp, w):
        return ba_mod._accumulate_family(K, poses, e, Jc, Jp, w, bird.kf_idx,
                                         jnp.float32(1e-4))

    Hcc, bc, Hppi, bp, Hcp = jax.block_until_ready(
        acc_front(poses0, e_f, Jc_f, Jp_f, w_f))

    @jax.jit
    def odm(poses):
        return ba_mod._odom_terms(K, poses, odom, ba.w_pose)

    @jax.jit
    def solve(Hcc, bc):
        return ba_mod._solve_reduced(Hcc, bc, fixed, jnp.float32(1e-4))

    @jax.jit
    def inv3(H):
        return jnp.linalg.inv(H + 1e-9 * jnp.eye(3))

    Hpp = jnp.einsum("pmdi,pm,pmdj->pij", Jp_f, w_f, Jp_f)

    timeit(fam_front, poses0, name="family_terms front (P=16k,M=16)")
    timeit(fam_bird, poses0, name="family_terms bird (PB=8k,M=8)")
    timeit(acc_front, poses0, e_f, Jc_f, Jp_f, w_f, name="accumulate front")
    timeit(acc_bird, poses0, e_b, Jc_b, Jp_b, w_b, name="accumulate bird")
    timeit(inv3, Hpp, name="linalg.inv 16k batched 3x3")
    timeit(odm, poses0, name="odom_terms")
    timeit(solve, Hcc, bc, name="solve_reduced 1536x1536")

    def full():
        return bundle_adjust(cfg.camera, cfg.ba, poses0, fixed, front, bird,
                             odom, n_iters_1=5, n_iters_2=10)
    timeit(full, reps=3, name="bundle_adjust (15 LM iters)")


if __name__ == "__main__":
    main()
