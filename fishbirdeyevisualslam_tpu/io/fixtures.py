"""Synthetic populated-map fixtures at configurable capacities.

Used by the scaling benchmarks and the driver's multi-chip dryrun: a MapState
at FULL (or reduced) capacity with geometrically consistent observations, the
input shape ``loop_closing.global_ba`` / ``parallel.sharded_ba`` see in
production (reference analog: a mature ``Map`` at ``LoopClosing``'s GBA,
``src/LoopClosing.cc:674-841``)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.slam import map_state as ms


def make_realistic_map(cfg: SystemConfig, seed=0) -> ms.MapState:
    """Populated MapState at full default capacities: K=256 valid KFs on a
    circle, every front/bird landmark observed by 2-4 consecutive KFs with
    GEOMETRICALLY CONSISTENT measurements (uv = project(X) + 0.5 px noise) —
    inconsistent random observations make the LM trajectory chaotic and
    reduction-order differences between shardings explode, which says nothing
    about the sharded solver."""
    rng = np.random.RandomState(seed)
    cap = cfg.capacity
    K, P, PB = cap.max_keyframes, cap.max_points, cap.max_bird_points
    M = cap.max_obs_per_point
    cam = cfg.camera
    m = ms.empty_map(cfg)
    th = np.linspace(0, 2 * np.pi, K, endpoint=False)
    poses = []
    for t in th:
        q = np.array([np.cos(t / 2), 0, 0, np.sin(t / 2)])
        poses.append(np.concatenate([q, [10 * np.cos(t), 10 * np.sin(t), 0.0]]))
    kf_Tcw = jnp.asarray(np.stack(poses), jnp.float32)
    Twc = np.asarray(jax.vmap(se3.inverse)(kf_Tcw))

    # each front point is born in a base KF's camera frame (guaranteed z > 0
    # there and in its consecutive observers).  Deterministic base spread:
    # points sharing a feature slot (p, p+F, p+2F, ...) get bases 32 KFs apart
    # so their 4-KF observation windows never collide on a (kf, slot) pair —
    # a collision would overwrite kf_uv and corrupt the earlier point's
    # measurement
    base = (np.arange(P) * K) // P
    Xc0 = np.stack([rng.uniform(-4, 4, P), rng.uniform(-2, 2, P),
                    rng.uniform(8, 30, P)], -1).astype(np.float32)
    Xw = np.asarray(jax.vmap(se3.transform)(
        jnp.asarray(Twc[base]), jnp.asarray(Xc0)[:, None, :]))[:, 0]
    nobs = rng.randint(2, 5, P)
    obs_kf = (base[:, None] + np.arange(M)[None, :]) % K
    obs_feat = np.zeros((P, M), np.int64)
    obs_valid = np.arange(M)[None, :] < nobs[:, None]
    # bird points on the ground near the circle (same spread rule)
    bbase = (np.arange(PB) * K) // PB
    MB = m.bobs_kf.shape[1]
    ang = th[bbase] + rng.uniform(-0.1, 0.1, PB)
    rad = rng.uniform(6, 14, PB)
    bXw = np.stack([rad * np.cos(ang), rad * np.sin(ang),
                    np.zeros(PB)], -1).astype(np.float32)
    bnobs = rng.randint(2, 4, PB)
    bobs_kf = (bbase[:, None] + np.arange(MB)[None, :]) % K
    bobs_feat = np.zeros((PB, MB), np.int64)
    bobs_valid = np.arange(MB)[None, :] < bnobs[:, None]

    # assign feature slots per (kf, obs) pair: each point claims a distinct
    # feature slot per KF (slot collisions only share uv storage — irrelevant
    # for BA, which reads by (kf, feat) pair)
    obs_feat = (np.arange(P)[:, None] % cap.max_front_kp).repeat(M, 1)
    bobs_feat = (np.arange(PB)[:, None] % cap.max_bird_kp).repeat(MB, 1)

    # consistent measurements: uv = project(Tcw_kf, Xw) + noise, written at the
    # claimed feature slots
    kf_uv = np.zeros((K, cap.max_front_kp, 2), np.float32)
    from fishbirdeyevisualslam_tpu.geometry import camera as cam_ops
    for j in range(M):
        pc = np.asarray(jax.vmap(se3.transform)(
            kf_Tcw[jnp.asarray(obs_kf[:, j])], jnp.asarray(Xw)[:, None, :]))[:, 0]
        uv = np.asarray(cam_ops.project_pinhole(cam, jnp.asarray(pc)))
        uv = uv + rng.randn(P, 2) * 0.5
        kf_uv[obs_kf[:, j], obs_feat[:, j]] = uv
    kf_bird_cam = np.zeros((K, cap.max_bird_kp, 3), np.float32)
    for j in range(MB):
        pc = np.asarray(jax.vmap(se3.transform)(
            kf_Tcw[jnp.asarray(bobs_kf[:, j])], jnp.asarray(bXw)[:, None, :]))[:, 0]
        kf_bird_cam[bobs_kf[:, j], bobs_feat[:, j]] = pc + rng.randn(PB, 3) * 0.02

    return m._replace(
        kf_Tcw=kf_Tcw,
        kf_valid=jnp.ones((K,), bool),
        kf_seq=jnp.arange(K, dtype=jnp.int32),
        kf_odom=jnp.asarray(np.stack(
            [10 * np.cos(th), 10 * np.sin(th), th], -1), jnp.float32),
        kf_uv=jnp.asarray(kf_uv),
        kf_octave=jnp.zeros((K, cap.max_front_kp), jnp.int32),
        kf_bird_cam=jnp.asarray(kf_bird_cam),
        kf_bird_octave=jnp.zeros((K, cap.max_bird_kp), jnp.int32),
        n_kf=jnp.int32(K), kf_counter=jnp.int32(K),
        mp_pos=jnp.asarray(Xw),
        mp_valid=jnp.ones((P,), bool),
        bp_pos=jnp.asarray(bXw),
        bp_valid=jnp.ones((PB,), bool),
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_feat=jnp.asarray(obs_feat, jnp.int32),
        obs_valid=jnp.asarray(obs_valid),
        bobs_kf=jnp.asarray(bobs_kf, jnp.int32),
        bobs_feat=jnp.asarray(bobs_feat, jnp.int32),
        bobs_valid=jnp.asarray(bobs_valid),
    )
