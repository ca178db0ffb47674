"""Loop-detect probe cost at full shipped capacities (r5 known-gap probe).

Measures, scanned over varied current-KF ids so the tunnel backend cannot
dedupe byte-identical executions:
  * ``covisibility_counts`` — new matmul form vs the old (P, M, M)
    scatter-add form (inlined here for comparison);
  * the full jitted ``detect_loop_groups`` probe (BoW scoring + covis groups
    + 75%-rule retrieval), i.e. the device work behind the ``loop_detect``
    tracer span that the r5 soak measured at 111 ms mean through the tunnel.

Run on TPU: python scripts/bench_loop_detect.py
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.slam import map_state as ms
from fishbirdeyevisualslam_tpu.slam.loop_closing import detect_loop_groups


def build_map(cfg):
    rng = np.random.RandomState(0)
    m = ms.empty_map(cfg)
    cap = cfg.capacity
    P, PB, K = cap.max_points, cap.max_bird_points, cap.max_keyframes
    M = m.obs_kf.shape[1]
    MB = m.bobs_kf.shape[1]
    # every point observed by a clustered set of KFs (covis structure like a
    # trajectory: point p's observers drawn near KF p*K//P)
    base = (np.arange(P) * K // P)[:, None]
    okf = np.clip(base + rng.randint(-4, 5, (P, M)), 0, K - 1)
    n_obs = rng.randint(2, M + 1, P)
    ovalid = np.arange(M)[None, :] < n_obs[:, None]
    bbase = (np.arange(PB) * K // PB)[:, None]
    bokf = np.clip(bbase + rng.randint(-3, 4, (PB, MB)), 0, K - 1)
    bovalid = np.arange(MB)[None, :] < rng.randint(1, MB + 1, PB)[:, None]
    F = m.kf_words.shape[1]
    m = m._replace(
        mp_valid=jnp.ones((P,), bool),
        bp_valid=jnp.ones((PB,), bool),
        kf_valid=jnp.ones((K,), bool),
        kf_seq=jnp.arange(K, dtype=jnp.int32),
        n_kf=jnp.int32(K), kf_counter=jnp.int32(K),
        obs_kf=jnp.asarray(okf, jnp.int32), obs_valid=jnp.asarray(ovalid),
        bobs_kf=jnp.asarray(bokf, jnp.int32), bobs_valid=jnp.asarray(bovalid),
        kf_words=jnp.asarray(rng.randint(0, 9999, (K, F)), jnp.int32),
        kf_kp_valid=jnp.ones((K, F), bool),
    )
    return m


def scanned_ms(fn, m, n=64):
    """Mean device ms/call of fn(m, kf) over VARIED map states (the obs table
    is rolled by a scan-step-dependent amount so the body cannot be hoisted
    out of the scan, and the rep seed varies so the tunnel backend cannot
    dedupe byte-identical executions — the r3 timing-integrity rule)."""
    @jax.jit
    def many(m, kfs):
        def body(acc, kf):
            mm = m._replace(obs_kf=jnp.roll(m.obs_kf, kf, axis=0),
                            bobs_kf=jnp.roll(m.bobs_kf, kf, axis=0))
            out = fn(mm, kf)
            leaf = jnp.asarray(jax.tree_util.tree_leaves(out)[0], jnp.float32)
            # data-dependent reduction: a plain sum of a scatter-add can be
            # algebraically elided to a sum of its updates
            r = leaf.ravel()
            w = jnp.cos(jnp.arange(r.shape[0], dtype=jnp.float32) + kf)
            return acc + jnp.dot(r, w), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), kfs)
        return acc
    kfs = jnp.arange(n, dtype=jnp.int32) * 7 % m.K
    float(many(m, kfs))                        # compile + fetch (warm path)
    reps = 5
    t0 = time.perf_counter()
    outs = [many(m, (kfs + r + 1) % m.K) for r in range(reps)]  # pipelined
    vals = [float(o) for o in outs]            # VALUE fetch — the only sync
    dt = (time.perf_counter() - t0) / reps     # primitive this backend honors
    assert len(set(vals)) > 1, "dedupe suspected: all reps returned equal"
    return dt * 1000.0 / n


def covis_scatter_old(m):
    """The pre-r5 (P, M, M) scatter-add covisibility build, for comparison."""
    K = m.K
    P, M = m.obs_kf.shape
    v = m.obs_valid & m.mp_valid[:, None]
    pair = (v[:, :, None] & v[:, None, :]).astype(jnp.int32)
    i = jnp.broadcast_to(m.obs_kf[:, :, None], (P, M, M))
    j = jnp.broadcast_to(m.obs_kf[:, None, :], (P, M, M))
    C = jnp.zeros((K, K), jnp.int32).at[i, j].add(pair)
    return C - jnp.diag(jnp.diag(C))


def main():
    cfg = SystemConfig()
    m = build_map(cfg)
    print(f"device={jax.devices()[0].platform} K={m.K} "
          f"P={m.obs_kf.shape[0]} M={m.obs_kf.shape[1]}")
    t_base = scanned_ms(lambda mm, kf: mm.obs_kf[:2, :2] + kf, m)
    print(f"harness (rolls only):           {t_base:8.3f} ms")
    t_new = scanned_ms(lambda mm, kf: ms.covisibility_counts(mm) + kf, m)
    print(f"covisibility_counts (matmul):   {t_new:8.3f} ms")
    t_old = scanned_ms(lambda mm, kf: covis_scatter_old(mm) + kf, m)
    print(f"covisibility_counts (scatter):  {t_old:8.3f} ms  ({t_old / t_new:.1f}x)")
    t_probe = scanned_ms(lambda mm, kf: detect_loop_groups(mm, kf, cfg), m)
    print(f"detect_loop_groups full probe:  {t_probe:8.3f} ms")


if __name__ == "__main__":
    main()
