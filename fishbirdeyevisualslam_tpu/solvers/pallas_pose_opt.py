"""Pallas TPU kernel: the ENTIRE per-frame pose LM in one kernel launch.

``pose_optimization`` (solvers/pose_opt.py — the reference's
``Optimizer::PoseOptimizationWithBird``, ``src/Optimizer.cc:478-705``) is a
4-round x 10-iteration Levenberg-Marquardt loop whose per-iteration compute is
tiny (N~2k residual rows reduced into a 6x6 system).  Compiled as ordinary XLA
it becomes ~40 sequential groups of small fused kernels and the per-frame time
is dominated by kernel-boundary latency, not math (measured 4.9 ms of a 7.6 ms
tracking step on v5e).

This kernel keeps every observation in VMEM and runs the full schedule —
residuals, analytic Jacobians, Huber IRLS weights, 6x6 normal equations,
unrolled scalar Cholesky, SE3 retraction, per-round chi2 re-gating — inside
one ``pallas_call``.  Semantics are identical to ``pose_optimization``:

  * rounds 0..2 restart from the input pose with the refined inlier set, the
    last round continues from the previous round's result (``Optimizer.cc:622``);
  * Huber (delta^2 = 5.991) active in rounds 0..2 only (``:657,685``);
  * front gate chi2 <= 1.5 * wF, bird gate chi2 <= 5.991 * wB (``:611-612``);
  * optional soft SE3 prior on the odometry prediction (framework extension,
    ``prior_info = 0`` reproduces the reference exactly).

Layout: observations enter in "plane" form — (3, N) world points, (2, N)
pixels, (1, N) information — so each row is one VPU vector; the LM state
(pose quaternion, 6x6 H, gradient, lambda) is a flat tuple of f32 scalars
carried through ``lax.fori_loop``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fishbirdeyevisualslam_tpu.config import BAConfig, CameraConfig


# ---------------------------------------------------------------------------
# Scalar SE3 helpers (tuples of traced f32 scalars — no arrays, no linalg)
# ---------------------------------------------------------------------------


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _quat_mul(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return (w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2)


def _quat_conj(q):
    return (q[0], -q[1], -q[2], -q[3])


def _quat_rotate(q, v):
    """v' = v + 2w (u x v) + 2 u x (u x v),  u = vec(q)."""
    u = (q[1], q[2], q[3])
    c1 = _cross(u, v)
    c2 = _cross(u, c1)
    return (v[0] + 2.0 * (q[0] * c1[0] + c2[0]),
            v[1] + 2.0 * (q[0] * c1[1] + c2[1]),
            v[2] + 2.0 * (q[0] * c1[2] + c2[2]))


def _quat_normalize(q):
    n = jax.lax.rsqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3] + 1e-30)
    return (q[0] * n, q[1] * n, q[2] * n, q[3] * n)


def _se3_retract(T, dx):
    """Left-multiplicative update T <- exp(dx) * T on scalar tuples.
    T = (q4, t3); dx = (omega3, ups3)."""
    q, t = T
    om = dx[:3]
    up = dx[3:]
    th2 = om[0] * om[0] + om[1] * om[1] + om[2] * om[2]
    small = th2 < 1e-12
    th = jnp.sqrt(jnp.where(small, 1.0, th2))
    half = 0.5 * th
    # exp quaternion
    kq = jnp.where(small, 0.5 - th2 / 48.0, jnp.sin(half) / th)
    wq = jnp.where(small, 1.0 - th2 / 8.0, jnp.cos(half))
    dq = _quat_normalize((wq, kq * om[0], kq * om[1], kq * om[2]))
    # V ups = ups + A (om x ups) + B (om (om.ups) - th2 ups)
    A = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / jnp.where(small, 1.0, th2))
    B = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (th - jnp.sin(th)) / jnp.where(small, 1.0, th2 * th))
    cxu = _cross(om, up)
    d = _dot3(om, up)
    dt = tuple(up[i] + A * cxu[i] + B * (om[i] * d - th2 * up[i]) for i in range(3))
    rt = _quat_rotate(dq, t)
    return (_quat_normalize(_quat_mul(dq, q)),
            (rt[0] + dt[0], rt[1] + dt[1], rt[2] + dt[2]))


def _se3_log_rel(T, Tp):
    """log(T * Tp^-1) -> 6 scalars (omega, upsilon).

    SO3 log uses an odd atan series (Mosaic has no atan2 lowering): with the
    hemisphere forced to w >= 0, theta = 2 atan(|v|/w), and the prior factor
    only ever evaluates this on the small relative rotation between the
    odometry prediction and the optimized pose — |v|/w < 0.5 (~53 deg) keeps
    the 7-term series below 0.5% error, far inside the soft prior's noise."""
    q, t = T
    qp, tp = Tp
    qpi = _quat_conj(qp)
    # T * Tp^-1: q_rel = q qp^-1; t_rel = t - R_rel tp
    qr = _quat_mul(q, qpi)
    # force w >= 0 hemisphere
    s = jnp.where(qr[0] < 0, -1.0, 1.0)
    qr = (qr[0] * s, qr[1] * s, qr[2] * s, qr[3] * s)
    rtp = _quat_rotate(qr, tp)
    tr = (t[0] - rtp[0], t[1] - rtp[1], t[2] - rtp[2])
    vn2 = qr[1] * qr[1] + qr[2] * qr[2] + qr[3] * qr[3]
    w = jnp.maximum(qr[0], 1e-6)
    # scale = 2 atan(x)/|v| = (2/w) (1 - x^2/3 + x^4/5 - x^6/7),  x = |v|/w
    x2 = vn2 / (w * w)
    scale = (2.0 / w) * (1.0 - x2 / 3.0 + x2 * x2 / 5.0 - x2 * x2 * x2 / 7.0)
    om = (scale * qr[1], scale * qr[2], scale * qr[3])
    # ups = Vinv t = t - 0.5 (om x t) + k (om (om.t) - th2 t)
    th2 = om[0] * om[0] + om[1] * om[1] + om[2] * om[2]
    sm2 = th2 < 1e-12
    tth = jnp.sqrt(jnp.where(sm2, 1.0, th2))
    halft = 0.5 * tth
    cot = halft * jnp.cos(halft) / jnp.where(sm2, 1.0, jnp.sin(halft))
    k = jnp.where(sm2, 1.0 / 12.0 + th2 / 720.0, (1.0 - cot) / jnp.where(sm2, 1.0, th2))
    cxt = _cross(om, tr)
    d = _dot3(om, tr)
    ups = tuple(tr[i] - 0.5 * cxt[i] + k * (om[i] * d - th2 * tr[i]) for i in range(3))
    return om + ups


def _chol_solve6(H, g):
    """6x6 Cholesky solve on scalar lists (H: list of 6 lists, g: list of 6)."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        s = H[i][i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-12))
        for j in range(i + 1, 6):
            s2 = H[j][i]
            for k in range(i):
                s2 = s2 - L[j][k] * L[i][k]
            L[j][i] = s2 / L[i][i]
    y = [None] * 6
    for i in range(6):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


# flat-tuple packing for the fori_loop carry: (q4, t3, err, lam, H21, g6)
_NH = 21
_TRI = [(i, j) for i in range(6) for j in range(i + 1)]


def _pack(T, err, lam, H, g):
    q, t = T
    flat = list(q) + list(t) + [err, lam]
    flat += [H[i][j] for (i, j) in _TRI]
    flat += list(g)
    return tuple(flat)


def _unpack(c):
    q = c[0:4]
    t = c[4:7]
    err, lam = c[7], c[8]
    Hf = c[9:9 + _NH]
    H = [[None] * 6 for _ in range(6)]
    for v, (i, j) in zip(Hf, _TRI):
        H[i][j] = v
        H[j][i] = v
    g = list(c[9 + _NH:9 + _NH + 6])
    return (q, t), err, lam, H, g


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_kernel(cam: CameraConfig, ba: BAConfig, prior_info: float):
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    wF, wB = ba.w_front, ba.w_bird
    delta = ba.huber_delta
    d2 = delta * delta
    chi2_f_gate = ba.chi2_mono_pose * (wF + 1e-9)
    chi2_b_gate = ba.chi2_bird * (wB + 1e-9)
    n_rounds, n_iters = ba.pose_rounds, ba.pose_iters

    def kernel(T0_ref, prior_ref,
               fxw_ref, fuv_ref, finfo_ref, fvalid_ref,
               bxw_ref, bxc_ref, binfo_ref, bvalid_ref,
               Tout_ref, fin_ref, bin_ref):
        T0 = ((T0_ref[0, 0], T0_ref[0, 1], T0_ref[0, 2], T0_ref[0, 3]),
              (T0_ref[0, 4], T0_ref[0, 5], T0_ref[0, 6]))
        Tp = ((prior_ref[0, 0], prior_ref[0, 1], prior_ref[0, 2], prior_ref[0, 3]),
              (prior_ref[0, 4], prior_ref[0, 5], prior_ref[0, 6]))

        fX = (fxw_ref[0:1, :], fxw_ref[1:2, :], fxw_ref[2:3, :])   # (1, N) each
        fu = fuv_ref[0:1, :]
        fv = fuv_ref[1:2, :]
        finfo = finfo_ref[0:1, :] * wF
        fvalid = fvalid_ref[0:1, :]
        bX = (bxw_ref[0:1, :], bxw_ref[1:2, :], bxw_ref[2:3, :])
        bC = (bxc_ref[0:1, :], bxc_ref[1:2, :], bxc_ref[2:3, :])
        binfo = binfo_ref[0:1, :] * wB
        bvalid = bvalid_ref[0:1, :]

        def rot_vec(T, X):
            """Apply pose to (1,N) vector planes via the rotation matrix."""
            q, t = T
            w, x, y, z = q
            r00 = 1 - 2 * (y * y + z * z); r01 = 2 * (x * y - w * z); r02 = 2 * (x * z + w * y)
            r10 = 2 * (x * y + w * z); r11 = 1 - 2 * (x * x + z * z); r12 = 2 * (y * z - w * x)
            r20 = 2 * (x * z - w * y); r21 = 2 * (y * z + w * x); r22 = 1 - 2 * (x * x + y * y)
            p0 = r00 * X[0] + r01 * X[1] + r02 * X[2] + t[0]
            p1 = r10 * X[0] + r11 * X[1] + r12 * X[2] + t[1]
            p2 = r20 * X[0] + r21 * X[1] + r22 * X[2] + t[2]
            return p0, p1, p2

        def front_chi2(T):
            p0, p1, p2 = rot_vec(T, fX)
            z = jnp.where(jnp.abs(p2) < 1e-6, 1e-6, p2)
            eu = fu - (fx * p0 / z + cx)
            ev = fv - (fy * p1 / z + cy)
            chi2 = (eu * eu + ev * ev) * finfo
            return chi2, (p0, p1, p2, z, eu, ev)

        def bird_chi2(T):
            p0, p1, p2 = rot_vec(T, bX)
            e0 = bC[0] - p0
            e1 = bC[1] - p1
            e2 = bC[2] - p2
            chi2 = (e0 * e0 + e1 * e1 + e2 * e2) * binfo
            return chi2, (p0, p1, p2, e0, e1, e2)

        def build_full(T, f_act, b_act, use_huber):
            """One residual evaluation -> (H 6x6 scalars, g 6 scalars, err)."""
            # ---- front terms
            chi2f, (p0, p1, p2, z, eu, ev) = front_chi2(T)
            if use_huber:
                wgt_f = jnp.where(chi2f <= d2, 1.0,
                                  delta * jax.lax.rsqrt(jnp.maximum(chi2f, 1e-12)))
            else:
                wgt_f = jnp.ones_like(chi2f)
            wgt_f = wgt_f * finfo * f_act
            a = fx / z
            b = fy / z
            c = -fx * p0 / (z * z)
            d = -fy * p1 / (z * z)
            # J rows (2 x 6) per obs; tangent = (omega, upsilon)
            ju = (-(c * p1), -(a * p2 - c * p0), a * p1, -a, jnp.zeros_like(a), -c)
            jv = (b * p2 - d * p1, d * p0, -(b * p0), jnp.zeros_like(b), -b, -d)
            H = [[jnp.zeros(()) for _ in range(6)] for _ in range(6)]
            g = [jnp.zeros(()) for _ in range(6)]
            for i in range(6):
                for j in range(i + 1):
                    H[i][j] = jnp.sum(wgt_f * (ju[i] * ju[j] + jv[i] * jv[j]))
                g[i] = -jnp.sum(wgt_f * (ju[i] * eu + jv[i] * ev))

            # ---- bird terms (J = [[p]x | -I])
            chi2b, (q0, q1, q2, e0, e1, e2) = bird_chi2(T)
            if use_huber:
                wgt_b = jnp.where(chi2b <= d2, 1.0,
                                  delta * jax.lax.rsqrt(jnp.maximum(chi2b, 1e-12)))
            else:
                wgt_b = jnp.ones_like(chi2b)
            wgt_b = wgt_b * binfo * b_act
            zv = jnp.zeros_like(q0)
            one = jnp.ones_like(q0)
            j0 = (zv, -q2, q1, -one, zv, zv)
            j1 = (q2, zv, -q0, zv, -one, zv)
            j2 = (-q1, q0, zv, zv, zv, -one)
            for i in range(6):
                for j in range(i + 1):
                    H[i][j] = H[i][j] + jnp.sum(
                        wgt_b * (j0[i] * j0[j] + j1[i] * j1[j] + j2[i] * j2[j]))
                g[i] = g[i] - jnp.sum(wgt_b * (j0[i] * e0 + j1[i] * e1 + j2[i] * e2))
            for i in range(6):
                for j in range(i + 1):
                    H[j][i] = H[i][j]

            # robustified error
            if use_huber:
                rf = jnp.where(chi2f > d2,
                               2.0 * delta * jnp.sqrt(jnp.maximum(chi2f, 0.0)) - d2, chi2f)
                rb = jnp.where(chi2b > d2,
                               2.0 * delta * jnp.sqrt(jnp.maximum(chi2b, 0.0)) - d2, chi2b)
            else:
                rf, rb = chi2f, chi2b
            err = jnp.sum(rf * f_act) + jnp.sum(rb * b_act)

            # ---- soft prior factor (J ~ I)
            if prior_info > 0.0:
                e = _se3_log_rel(T, Tp)
                for i in range(6):
                    H[i][i] = H[i][i] + prior_info
                    g[i] = g[i] - prior_info * e[i]
                    err = err + prior_info * e[i] * e[i]
            return H, g, err

        def one_round(T_init, f_act, b_act, use_huber):
            H0, g0, err0 = build_full(T_init, f_act, b_act, use_huber)

            def lm_step(_, carry):
                T, err, lam, H, g = _unpack(carry)
                Hd = [[H[i][j] + (lam * H[i][i] + 1e-10 if i == j else 0.0)
                       for j in range(6)] for i in range(6)]
                dx = _chol_solve6(Hd, g)
                finite = jnp.ones((), bool)
                for v in dx:
                    finite = finite & jnp.isfinite(v)
                T_cand = _se3_retract(T, tuple(dx))
                H_c, g_c, err_c = build_full(T_cand, f_act, b_act, use_huber)
                accept = (err_c < err) & finite
                qn = tuple(jnp.where(accept, T_cand[0][i], T[0][i]) for i in range(4))
                tn = tuple(jnp.where(accept, T_cand[1][i], T[1][i]) for i in range(3))
                err_n = jnp.where(accept, err_c, err)
                H_n = [[jnp.where(accept, H_c[i][j], H[i][j]) for j in range(6)]
                       for i in range(6)]
                g_n = [jnp.where(accept, g_c[i], g[i]) for i in range(6)]
                lam_n = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e6)
                return _pack((qn, tn), err_n, lam_n, H_n, g_n)

            carry = _pack(T_init, err0, jnp.float32(1e-4), H0, g0)
            carry = jax.lax.fori_loop(0, n_iters, lm_step, carry)
            T, _, _, _, _ = _unpack(carry)
            # re-gate at the optimized pose (raw chi2, no Huber)
            chi2f, _ = front_chi2(T)
            chi2b, _ = bird_chi2(T)
            f_new = fvalid * (chi2f <= chi2_f_gate).astype(jnp.float32)
            b_new = bvalid * (chi2b <= chi2_b_gate).astype(jnp.float32)
            return T, f_new, b_new

        f_act, b_act = fvalid, bvalid
        T = T0
        for it in range(n_rounds):
            T_start = T0 if it < n_rounds - 1 else T
            T, f_act, b_act = one_round(T_start, f_act, b_act, use_huber=it < 3)

        Tout_ref[0, 0] = T[0][0]
        Tout_ref[0, 1] = T[0][1]
        Tout_ref[0, 2] = T[0][2]
        Tout_ref[0, 3] = T[0][3]
        Tout_ref[0, 4] = T[1][0]
        Tout_ref[0, 5] = T[1][1]
        Tout_ref[0, 6] = T[1][2]
        Tout_ref[0, 7] = jnp.zeros(())
        fin_ref[0:1, :] = f_act
        bin_ref[0:1, :] = b_act

    return kernel


def _pad_lanes(n: int) -> int:
    return -(-n // 128) * 128


@functools.partial(
    jax.jit, static_argnames=("cam", "ba", "prior_info", "interpret"))
def pose_optimization_fused(
    cam: CameraConfig, ba: BAConfig, Tcw0, front, bird,
    prior_T=None, prior_info: float = 0.0, interpret: bool = False,
):
    """Drop-in fused variant of ``pose_optimization`` (same inputs/outputs —
    see solvers/pose_opt.py).  front: FrontObs, bird: BirdObs."""
    from fishbirdeyevisualslam_tpu.solvers.pose_opt import PoseOptResult

    N = front.uv.shape[0]
    NB = bird.Xc.shape[0]
    Np, NBp = _pad_lanes(N), _pad_lanes(NB)
    f32 = jnp.float32

    T0 = jnp.zeros((1, 8), f32).at[0, :7].set(Tcw0.astype(f32))
    pT = Tcw0 if prior_T is None else prior_T
    Tpr = jnp.zeros((1, 8), f32).at[0, :7].set(pT.astype(f32))

    def plane(x, n_pad, fill=0.0):
        # (N, D) -> (D, n_pad)
        out = jnp.full((x.shape[1], n_pad), fill, f32)
        return out.at[:, :x.shape[0]].set(x.T.astype(f32))

    fxw = plane(front.Xw, Np)
    fuv = plane(front.uv, Np)
    finfo = jnp.zeros((1, Np), f32).at[0, :N].set(front.inv_sigma2.astype(f32))
    fval = jnp.zeros((1, Np), f32).at[0, :N].set(front.valid.astype(f32))
    # padded front points default to z=1 to keep 1/z benign; masked by act=0
    fxw = fxw.at[2, N:].set(1.0)
    bxw = plane(bird.Xw, NBp)
    bxc = plane(bird.Xc, NBp)
    binfo = jnp.zeros((1, NBp), f32).at[0, :NB].set(bird.inv_sigma2.astype(f32))
    bval = jnp.zeros((1, NBp), f32).at[0, :NB].set(bird.valid.astype(f32))

    kernel = _make_kernel(cam, ba, float(prior_info))
    vspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    Tout, fin, bin_ = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 8), f32),
            jax.ShapeDtypeStruct((1, Np), f32),
            jax.ShapeDtypeStruct((1, NBp), f32),
        ),
        in_specs=[vspec() for _ in range(10)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM), vspec(), vspec()),
        interpret=interpret,
    )(T0, Tpr, fxw, fuv, finfo, fval, bxw, bxc, binfo, bval)

    T = Tout[0, :7]
    f_in = (fin[0, :N] > 0.5) & front.valid
    b_in = (bin_[0, :NB] > 0.5) & bird.valid
    n_enough = jnp.sum(front.valid.astype(jnp.int32)) >= 3
    T = jnp.where(n_enough, T, Tcw0)
    return PoseOptResult(T, f_in, b_in, jnp.sum(f_in.astype(jnp.int32)))
