"""Standalone bird's-eye-view odometer (demo pipeline, not in the SLAM path).

The reference ships ``edge_filter_ipm`` + ``simple_birdseye_odometer`` as a
self-contained 2D scan-matching odometry over IPM edge clouds
(``src/edge_filter_ipm.cpp``, ``src/simple_birdseye_odometer.cpp``; it uses
pclomp NDT with key-cloud updates at 1 m / 5 deg).  Nothing in the SLAM calls
it (SURVEY.md §2) — it demonstrates the bird-view odometry idea.  The TPU-native
analog: gradient-edge extraction on the bird image and fixed-iteration
point-to-point ICP (batched nearest neighbors + closed-form SE2 updates), all
jittable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.geometry import ipm


class EdgeCloud(NamedTuple):
    xy: jnp.ndarray     # (N, 2) base-frame ground coordinates
    valid: jnp.ndarray  # (N,) bool


@functools.partial(jax.jit, static_argnums=(2, 3))
def edge_cloud(bird_img, mask, cfg: SystemConfig, n_points: int = 1024) -> EdgeCloud:
    """Gradient-magnitude edge extraction -> top-n edge pixels -> metric base
    frame (the ``EdgeFilterIPM::process`` -> labeled-cloud export analog)."""
    gy = bird_img[2:, 1:-1] - bird_img[:-2, 1:-1]
    gx = bird_img[1:-1, 2:] - bird_img[1:-1, :-2]
    g = jnp.sqrt(gx * gx + gy * gy)
    g = jnp.pad(g, 1)
    g = jnp.where(mask > 0, g, 0.0)
    flat = g.reshape(-1)
    v, idx = jax.lax.top_k(flat, n_points)
    rows = idx // bird_img.shape[1]
    cols = idx % bird_img.shape[1]
    pix = jnp.stack([cols.astype(jnp.float32), rows.astype(jnp.float32)], axis=-1)
    base = ipm.bird_pixel_to_base_xy(cfg.bird, pix)
    return EdgeCloud(base[:, :2], v > 10.0)


def _se2_fit(p_ref, p_cur, w):
    """Weighted closed-form SE2 aligning cur -> ref."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_r = jnp.sum(p_ref * w[:, None], axis=0) / wsum
    mu_c = jnp.sum(p_cur * w[:, None], axis=0) / wsum
    qr = p_ref - mu_r
    qc = p_cur - mu_c
    sxx = jnp.sum(w * (qc[:, 0] * qr[:, 0] + qc[:, 1] * qr[:, 1]))
    sxy = jnp.sum(w * (qc[:, 0] * qr[:, 1] - qc[:, 1] * qr[:, 0]))
    th = jnp.arctan2(sxy, sxx)
    c, s = jnp.cos(th), jnp.sin(th)
    t = mu_r - jnp.stack([c * mu_c[0] - s * mu_c[1], s * mu_c[0] + c * mu_c[1]])
    return t[0], t[1], th


@jax.jit
def icp_se2(ref: EdgeCloud, cur: EdgeCloud, init_xyt, n_iters: int = 12,
            max_corr: float = 0.5):
    """Fixed-iteration point-to-point ICP: returns (x, y, theta) mapping current
    cloud into the reference frame (the NDT registration analog)."""

    def body(carry, _):
        x, y, th = carry
        c, s = jnp.cos(th), jnp.sin(th)
        moved = jnp.stack([
            c * cur.xy[:, 0] - s * cur.xy[:, 1] + x,
            s * cur.xy[:, 0] + c * cur.xy[:, 1] + y,
        ], axis=-1)
        d2 = jnp.sum((moved[:, None, :] - ref.xy[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(ref.valid[None, :], d2, 1e9)
        nn = jnp.argmin(d2, axis=1)
        nnd = jnp.min(d2, axis=1)
        w = (cur.valid & (nnd < max_corr**2)).astype(jnp.float32)
        tx, ty, dth = _se2_fit(ref.xy[nn], cur.xy, w)
        return (tx, ty, dth), None

    (x, y, th), _ = jax.lax.scan(body, (init_xyt[0], init_xyt[1], init_xyt[2]),
                                 None, length=n_iters)
    return jnp.stack([x, y, th])


class BirdOdometer:
    """``SimpleBirdseyeOdometer`` analog: accumulate SE2 pose by registering each
    frame's edge cloud to a key cloud; key cloud refreshed at 1 m / 5 deg."""

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.key_cloud = None
        self.key_pose = np.zeros(3)   # world pose of the key cloud
        self.pose = np.zeros(3)       # current world SE2 pose

    def add_new_frame(self, bird_img, mask) -> np.ndarray:
        cloud = edge_cloud(jnp.asarray(bird_img, jnp.float32), jnp.asarray(mask),
                           self.cfg)
        if self.key_cloud is None:
            self.key_cloud = cloud
            return self.pose.copy()
        # init from previous relative estimate (identity here)
        rel0 = self.pose - self.key_pose
        c, s = np.cos(self.key_pose[2]), np.sin(self.key_pose[2])
        init = jnp.asarray([
            c * (rel0[0]) + s * (rel0[1]),
            -s * (rel0[0]) + c * (rel0[1]),
            rel0[2],
        ], jnp.float32)
        rel = np.asarray(icp_se2(self.key_cloud, cloud, init))
        # world pose = key_pose ∘ rel
        c, s = np.cos(self.key_pose[2]), np.sin(self.key_pose[2])
        self.pose = np.array([
            self.key_pose[0] + c * rel[0] - s * rel[1],
            self.key_pose[1] + s * rel[0] + c * rel[1],
            self.key_pose[2] + rel[2],
        ])
        # key-cloud update at 1 m / 5 deg (simple_birdseye_odometer.cpp:76-310)
        if np.hypot(rel[0], rel[1]) > 1.0 or abs(rel[2]) > np.deg2rad(5):
            self.key_cloud = cloud
            self.key_pose = self.pose.copy()
        return self.pose.copy()
