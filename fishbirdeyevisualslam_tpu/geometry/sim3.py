"""Sim(3) operations for loop closing.

The reference optimizes loop constraints over ``g2o::Sim3`` (7 dof) unless
``bFixScale`` pins s=1 (``src/System.cc:102``, ``src/Optimizer.cc:1168-1558``).
Representation: ``(..., 8)`` array ``[qw qx qy qz tx ty tz s]``.
"""

from __future__ import annotations

import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.geometry import se3


def make(q, t, s):
    return jnp.concatenate([q, t, s[..., None] if s.ndim < q.ndim else s], axis=-1)


def from_se3(T, s=None):
    scale = jnp.ones_like(T[..., :1]) if s is None else jnp.broadcast_to(s, T[..., :1].shape)
    return jnp.concatenate([T, scale], axis=-1)


def to_se3(S):
    """Drop scale (used when writing corrected poses back: t/s then SE3,
    reference ``LoopClosing.cc:544-551`` eigt *=(1./s))."""
    q, t, s = S[..., :4], S[..., 4:7], S[..., 7:]
    return se3.make(q, t / s)


def scale(S):
    return S[..., 7]


def compose(S1, S2):
    """S1 * S2: R = R1 R2, t = s1 R1 t2 + t1, s = s1 s2 (g2o Sim3 convention)."""
    q1, t1, s1 = S1[..., :4], S1[..., 4:7], S1[..., 7:]
    q2, t2, s2 = S2[..., :4], S2[..., 4:7], S2[..., 7:]
    return jnp.concatenate(
        [se3.quat_mul(q1, q2), s1 * se3.quat_rotate(q1, t2) + t1, s1 * s2], axis=-1
    )


def inverse(S):
    q, t, s = S[..., :4], S[..., 4:7], S[..., 7:]
    qi = se3.quat_conj(q)
    si = 1.0 / s
    return jnp.concatenate([qi, -si * se3.quat_rotate(qi, t), si], axis=-1)


def transform(S, p):
    """Apply: s R p + t."""
    return S[..., 7:] * se3.quat_rotate(S[..., :4], p) + S[..., 4:7]


def log(S):
    """(omega, upsilon, sigma) 7-vector; upsilon uses the SE3 V^-1 on t/s — an
    adequate approximation for the small corrections in essential-graph LM."""
    sigma = jnp.log(S[..., 7:])
    xi = se3.log(to_se3(S))
    return jnp.concatenate([xi[..., :3], xi[..., 3:], sigma], axis=-1)


def exp(v):
    omega, ups, sigma = v[..., :3], v[..., 3:6], v[..., 6:]
    T = se3.exp(jnp.concatenate([omega, ups], axis=-1))
    s = jnp.exp(sigma)
    return jnp.concatenate([T[..., :4], s * T[..., 4:], s], axis=-1)


def retract(S, v):
    return compose(exp(v), S)
