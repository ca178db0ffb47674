"""SE(3) / SO(3) Lie-group operations on batched arrays.

The reference stores poses as 4x4 ``cv::Mat`` and optimizes over ``g2o::SE3Quat``
with left-multiplicative updates ``T <- exp(xi) * T`` where ``xi = (omega, upsilon)``
(rotation first), giving point Jacobians of the form ``[-[p]x | I]``
(``src/OdomG2oTypeQuat.cc:6-78``).  We keep the same tangent convention so the
reference's analytic Jacobians are the spec for our solvers.

Representation here: a pose is a single ``(..., 7)`` array ``[qw, qx, qy, qz, tx, ty, tz]``
(unit quaternion, Hamilton convention).  7-vectors are pytree-trivial, vmap/scan
friendly, and cheap to gather/scatter from the struct-of-arrays map state.
All functions broadcast over leading dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion primitives (Hamilton, wxyz)
# ---------------------------------------------------------------------------


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q.  Shapes broadcast over leading dims."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    return quat_mul(quat_mul(q, qv), quat_conj(q))[..., 1:]


def quat_to_matrix(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def matrix_to_quat(R):
    """Rotation matrix -> quaternion (wxyz), branch-free (Shepperd via 4-way select)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate quaternions (unnormalized), one per dominant diagonal term.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3) exp/log
# ---------------------------------------------------------------------------


def skew(v):
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp_quat(omega):
    """Axis-angle -> quaternion (wxyz); Taylor-safe near 0 (incl. gradients: the
    sqrt is taken on a guarded argument so no NaN leaks through the untaken
    branch of the where)."""
    theta2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = theta2 < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * theta
    # sin(t/2)/t with series fallback
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([w, k * omega], axis=-1))


def so3_log(q):
    """Quaternion (wxyz) -> axis-angle."""
    q = q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))  # w >= 0 branch
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = vn2 < 1e-18
    vn = jnp.sqrt(jnp.where(small, 1.0, vn2))
    theta = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), theta / vn)
    return scale * v


def _so3_left_jacobian(omega):
    """V matrix: exp([w]x) translation coupling, with Taylor fallback."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 < 1e-12
    safe2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe2)
    W = skew(omega)
    W2 = W @ W
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    B = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (safe2 * theta))
    I = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def _so3_left_jacobian_inv(omega):
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 < 1e-12
    safe2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe2)
    W = skew(omega)
    W2 = W @ W
    half = 0.5 * theta
    cot = half * jnp.cos(half) / jnp.sin(half)
    k = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - cot) / safe2)
    I = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), W.shape)
    return I - 0.5 * W + k[..., None, None] * W2


# ---------------------------------------------------------------------------
# SE(3): pose = [qw qx qy qz tx ty tz]
# ---------------------------------------------------------------------------

IDENTITY = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], dtype=jnp.float32)


def make(q, t):
    return jnp.concatenate([q, t], axis=-1)


def rotation(T):
    return T[..., :4]


def translation(T):
    return T[..., 4:]


def identity(shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(IDENTITY.astype(dtype), tuple(shape) + (7,))


def compose(T1, T2):
    """T1 * T2 (apply T2 first)."""
    q1, t1 = T1[..., :4], T1[..., 4:]
    q2, t2 = T2[..., :4], T2[..., 4:]
    return make(quat_mul(q1, q2), quat_rotate(q1, t2) + t1)


def inverse(T):
    q, t = T[..., :4], T[..., 4:]
    qi = quat_conj(q)
    return make(qi, -quat_rotate(qi, t))


def transform(T, p):
    """Apply pose to point(s): R p + t."""
    return quat_rotate(T[..., :4], p) + T[..., 4:]


def normalize(T):
    return make(quat_normalize(T[..., :4]), T[..., 4:])


def exp(xi):
    """se3 exp, tangent ordered (omega, upsilon) like g2o's update vector.

    Matches the left-multiplicative vertex update convention whose point Jacobian is
    ``[-[p]x | I]`` (reference ``src/OdomG2oTypeQuat.cc:19-22``).
    """
    omega, ups = xi[..., :3], xi[..., 3:]
    q = so3_exp_quat(omega)
    V = _so3_left_jacobian(omega)
    t = jnp.einsum("...ij,...j->...i", V, ups)
    return make(q, t)


def log(T):
    """se3 log -> (omega, upsilon)."""
    omega = so3_log(T[..., :4])
    Vinv = _so3_left_jacobian_inv(omega)
    ups = jnp.einsum("...ij,...j->...i", Vinv, T[..., 4:])
    return jnp.concatenate([omega, ups], axis=-1)


def retract(T, xi):
    """Left-multiplicative update  T <- exp(xi) * T  (g2o VertexSE3Expmap::oplusImpl)."""
    return normalize(compose(exp(xi), T))


def to_matrix(T):
    """Pose 7-vector -> 4x4 homogeneous matrix."""
    R = quat_to_matrix(T[..., :4])
    t = T[..., 4:]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(M):
    return make(matrix_to_quat(M[..., :3, :3]), M[..., :3, 3])


def adjoint(T):
    """6x6 adjoint in (omega, upsilon) ordering: [[R, 0], [[t]x R, R]]."""
    R = quat_to_matrix(T[..., :4])
    t = T[..., 4:]
    tR = skew(t) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bot = jnp.concatenate([tR, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def relative_error(T_meas, T1, T2):
    """Pose-graph residual ``log(T_meas^-1 * T1 * T2^-1)`` in (omega, upsilon).

    Mirrors ``EdgeSE3Quat::computeError`` (``include/OdomG2oTypeQuat.h:176-192``,
    error = (m^-1 v1 v2^-1).log()).
    """
    return log(compose(inverse(T_meas), compose(T1, inverse(T2))))


def jr_inv_approx(e):
    """Right-Jacobian-inverse approximation of the reference's ``EdgeSE3Quat::JRInv``
    (``src/OdomG2oTypeQuat.cc:180-190``): J = I + 0.5*[[skew(w), 0], [skew(v), skew(w)]]
    for e = (omega, upsilon)."""
    Sw = skew(e[..., :3])
    Sv = skew(e[..., 3:])
    Z = jnp.zeros_like(Sw)
    top = jnp.concatenate([Sw, Z], axis=-1)
    bot = jnp.concatenate([Sv, Sw], axis=-1)
    J = jnp.concatenate([top, bot], axis=-2)
    I6 = jnp.broadcast_to(jnp.eye(6, dtype=e.dtype), J.shape)
    return 0.5 * J + I6


# Convenience for tests
def random_pose(key, scale_rot=1.0, scale_trans=1.0):
    k1, k2 = jax.random.split(key)
    omega = scale_rot * jax.random.normal(k1, (3,))
    t = scale_trans * jax.random.normal(k2, (3,))
    return make(so3_exp_quat(omega), t)
