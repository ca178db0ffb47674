"""Batched sparse Levenberg-Marquardt bundle adjustment with Schur complement.

Re-implements the reference's g2o-based BA family as one fixed-shape JAX solver:

  * ``LocalBundleAdjustmentWithOdom`` (``src/Optimizer.cc:2137-2495``): local-window
    KFs + fixed observers, front 2D reprojection edges, bird 3D-3D edges, and SE3
    odometry chain/skip edges (info 1e4*wP / 2e3 / 1e3*wP, ``:2419-2495``).
  * ``BundleAdjustmentWithOdom`` / ``GlobalBundleAdjustemntWithOdom``
    (``:1778-2135``): same factor types over the whole map.

Design (SURVEY.md §7): observations are grouped BY LANDMARK into fixed-width
padded blocks (P, M) — landmark-major layout makes the point marginalization a
batched 3x3 solve and every contraction an einsum.  The reduced camera system
(6K x 6K, K <= a few hundred) is solved densely — on TPU a 1536^2 Cholesky is
microseconds; g2o's CSparse machinery has no reason to exist here.

Gauge fixing: ``fixed`` mask per KF (the reference fixes ``isInit`` KFs and
observer KFs outside the window); their tangent blocks are pinned by identity
rows in the reduced system.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.config import BAConfig, CameraConfig
from fishbirdeyevisualslam_tpu.geometry import se3
from fishbirdeyevisualslam_tpu.solvers import residuals as res
from fishbirdeyevisualslam_tpu.solvers.linalg import inv3 as _inv3


class PointBlocks(NamedTuple):
    """Landmark-major observation blocks for one residual family.

    For front points the measurement is uv (D=2); for bird points it is the
    camera-frame 3D point (D=3).
    """

    Xw: jnp.ndarray          # (P, 3) landmark positions (optimized)
    kf_idx: jnp.ndarray      # (P, M) int32 observing-KF slot, 0 if invalid
    meas: jnp.ndarray        # (P, M, D) measurement
    inv_sigma2: jnp.ndarray  # (P, M)
    valid: jnp.ndarray       # (P, M) bool
    point_valid: jnp.ndarray # (P,) bool


class OdomEdges(NamedTuple):
    """SE3 relative-pose factors between KF slots (odometry chain + skip edges)."""

    i: jnp.ndarray       # (E,) int32
    j: jnp.ndarray       # (E,) int32
    T_meas: jnp.ndarray  # (E, 7) measured T_i_j (camera-frame relative pose)
    info: jnp.ndarray    # (E,) isotropic information scale
    valid: jnp.ndarray   # (E,) bool


class BAResult(NamedTuple):
    poses: jnp.ndarray         # (K, 7)
    front_Xw: jnp.ndarray      # (P, 3)
    bird_Xw: jnp.ndarray       # (PB, 3)
    front_inlier: jnp.ndarray  # (P, M) bool — per-observation classification
    bird_inlier: jnp.ndarray   # (PB, MB) bool


def _family_terms(cam: Optional[CameraConfig], poses, blocks: PointBlocks,
                  weight, huber_delta, use_huber, active, is_front: bool):
    """Per-family residual/Jacobian/weight tensors.

    Returns e (P,M,D), Jc (P,M,D,6), Jp (P,M,D,3), w (P,M), chi2 (P,M).
    """
    T = poses[blocks.kf_idx]  # (P, M, 7)
    if is_front:
        e, Jc, _ = res.front_residuals(cam, T, blocks.Xw[:, None, :], blocks.meas)
        Jp = res.front_point_jacobian(cam, T, blocks.Xw[:, None, :])
    else:
        e, Jc, _ = res.bird_residuals(T, blocks.Xw[:, None, :], blocks.meas)
        Jp = res.bird_point_jacobian(T, blocks.Xw[:, None, :])
    info = blocks.inv_sigma2 * weight
    chi2 = jnp.sum(e * e, axis=-1) * info
    w = jnp.where(use_huber, res.huber_weights(chi2, huber_delta), 1.0)
    w = w * info * active
    return e, Jc, Jp, w, chi2


def _depth_mask(cam, poses, blocks: PointBlocks):
    """Positive-depth requirement for front observations (the reference erases
    negative-depth edges, ``EdgeSE3ProjectXYZ2UVQuat::isDepthPositive``)."""
    T = poses[blocks.kf_idx]
    p = se3.transform(T, blocks.Xw[:, None, :])
    return p[..., 2] > 0


def _family_chi2(cam: Optional[CameraConfig], poses, blocks: PointBlocks,
                 weight, is_front: bool):
    """Residual-only chi2 (+ positive-depth mask) — skips every Jacobian the
    LM accept/reject and the outlier re-gate never read.  Returns
    (chi2 (P,M), depth_ok (P,M))."""
    T = poses[blocks.kf_idx]
    if is_front:
        e, p = res.front_error(cam, T, blocks.Xw[:, None, :], blocks.meas)
    else:
        e, p = res.bird_error(T, blocks.Xw[:, None, :], blocks.meas)
    chi2 = jnp.sum(e * e, axis=-1) * (blocks.inv_sigma2 * weight)
    return chi2, p[..., 2] > 0


def _odom_chi2(poses, edges: OdomEdges, w_scale):
    """Residual-only odometry chi2, masked by edge validity (invalid / padding
    edges must not steer the LM accept decision)."""
    e = se3.relative_error(edges.T_meas, poses[edges.i], poses[edges.j])
    return jnp.sum(e * e, axis=-1) * edges.info * edges.valid * w_scale




class _System(NamedTuple):
    Hcc: jnp.ndarray  # (K, K, 6, 6) reduced camera Hessian (block form)
    bc: jnp.ndarray   # (K, 6) reduced camera gradient (solve Hcc dx = bc)
    Hpp: jnp.ndarray  # (P_total, 3, 3) point blocks (damped)
    bp: jnp.ndarray   # (P_total, 3)
    Hcp: jnp.ndarray  # per-family retained for back-substitution


def _assemble_camera_system(K, kf_idx, Hc_diag, bc_pm, T, Hcp):
    """Matmul (one-hot segment) assembly of the reduced camera system.

    Replaces TPU scatter-adds, which dominated BA on-chip (~7.5 s per global
    BA at K=256, nearly independent of landmark count — the scatter engine,
    not the FLOPs, was the bottleneck; STATUS r3).  The trick is the same
    one-hot contraction already used for ``bird_local_mask``: with
    O[p,m,k] = [kf_idx[p,m] == k],

      diag[k]      = sum_{p,m} O[p,m,k] * Hc_diag[p,m]          (matmul)
      bc[k]        = sum_{p,m} O[p,m,k] * bc_pm[p,m]            (matmul)
      pair[k,l]    = sum_p U_p[k] @ V_p[l]^T,  U = O^T T, V = O^T Hcp

    The pair term becomes one (K*6, C*3) x (C*3, K*6) MXU matmul per point
    chunk.  Chunked over points at C = min(P, 4096), which bounds the dense
    one-hot-expanded U/V intermediates of shape (C, K*6, 3) to ~75 MB each at
    K=256 (f32) — comfortably within HBM, and large enough chunks that the
    (K*6, K*6) pair GEMM stays MXU-efficient (r4 measured timings used this
    chunk size).

    ``Hc_diag`` (P,M,36) flat camera diag blocks, ``bc_pm`` (P,M,6) gradient
    terms, ``T = Hcp Hpp^-1`` (P,M,6,3), ``Hcp`` (P,M,6,3).  Camera blocks
    stay FLAT (...,36) — a (...,6,6) trailing pair pads to the (8,128) tile,
    a 28x memory expansion."""
    P, M = kf_idx.shape
    C = min(P, 4096)
    pad = (-P) % C
    if pad:
        def _pad(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        kf_idx, Hc_diag, bc_pm, T, Hcp = (
            _pad(kf_idx), _pad(Hc_diag), _pad(bc_pm), _pad(T), _pad(Hcp))
    nc = (P + pad) // C
    xs = (kf_idx.reshape(nc, C, M),
          Hc_diag.reshape(nc, C, M, 36),
          bc_pm.reshape(nc, C, M, 6),
          T.reshape(nc, C, M, 6, 3),
          Hcp.reshape(nc, C, M, 6, 3))

    def body(carry, xs):
        pair, diag, bc = carry
        kf, Hd, bcm, Tm, Hp = xs
        O = (kf[..., None] == jnp.arange(K)).astype(jnp.float32)  # (C,M,K)
        diag = diag + jnp.einsum("cmk,cmx->kx", O, Hd)
        bc = bc + jnp.einsum("cmk,cmx->kx", O, bcm)
        # emit U/V in (C, K*6, 3) and contract (chunk, coord) in ONE
        # dot_general — the explicit (C,K,6,3)->(K,6,C,3) transposes cost 2x
        # the GEMM itself in HBM copies (profiled r4)
        U = jnp.einsum("cmk,cmax->ckax", O, Tm).reshape(C, K * 6, 3)
        V = jnp.einsum("cmk,cmax->ckax", O, Hp).reshape(C, K * 6, 3)
        pair = pair + jax.lax.dot_general(U, V, (((0, 2), (0, 2)), ((), ())))
        return (pair, diag, bc), None

    init = (jnp.zeros((K * 6, K * 6)), jnp.zeros((K, 36)), jnp.zeros((K, 6)))
    (pair, diag, bc), _ = jax.lax.scan(body, init, xs)
    Hcc = -pair.reshape(K, 6, K, 6).transpose(0, 2, 1, 3).reshape(K, K, 36)
    Hcc = Hcc + jnp.eye(K)[:, :, None] * diag[:, None, :]
    return Hcc, bc


def _accumulate_family(K, poses, e, Jc, Jp, w, kf_idx, lam_p):
    """One family's contributions: returns (Hcc_add (K,K,36) flat camera-block
    Hessian, bc_add (K,6), Hpp_inv (P,3,3), bp (P,3), Hcp (P,M,6,3))."""
    P, M = w.shape
    # camera diag blocks: sum_m Jc^T w Jc at (kf, kf).  Gradient convention:
    # we solve H dx = b with b = -J^T W e (residual e = obs - pred).
    Hc_diag = jnp.einsum("pmdi,pm,pmdj->pmij", Jc, w, Jc)  # (P,M,6,6)
    bc_obs = -jnp.einsum("pmdi,pm,pmd->pmi", Jc, w, e)      # (P,M,6)
    Hpp = jnp.einsum("pmdi,pm,pmdj->pij", Jp, w, Jp)        # (P,3,3)
    bp = -jnp.einsum("pmdi,pm,pmd->pi", Jp, w, e)           # (P,3)
    Hcp = jnp.einsum("pmdi,pm,pmdj->pmij", Jc, w, Jp)       # (P,M,6,3)

    Hpp_d = Hpp + lam_p * jnp.eye(3) * jnp.maximum(
        jnp.trace(Hpp, axis1=-2, axis2=-1)[..., None, None] / 3.0, 1e-6
    )
    Hpp_inv = _inv3(Hpp_d + 1e-9 * jnp.eye(3))

    T = jnp.einsum("pmij,pjk->pmik", Hcp, Hpp_inv)          # (P,M,6,3)
    bs = jnp.einsum("pmik,pk->pmi", T, bp)                  # (P,M,6)

    Hcc, bc = _assemble_camera_system(
        K, kf_idx, Hc_diag.reshape(P, M, 36), bc_obs - bs,
        T, Hcp)
    return Hcc, bc, Hpp_inv, bp, Hcp


def _odom_terms(K, poses, edges: OdomEdges, w_scale):
    e, J1, J2 = res.odom_residuals(edges.T_meas, poses[edges.i], poses[edges.j])
    w = edges.info * edges.valid * w_scale  # (E,)
    Hii = jnp.einsum("eki,e,ekj->eij", J1, w, J1)
    Hjj = jnp.einsum("eki,e,ekj->eij", J2, w, J2)
    Hij = jnp.einsum("eki,e,ekj->eij", J1, w, J2)
    bi = -jnp.einsum("eki,e,ek->ei", J1, w, e)
    bj = -jnp.einsum("eki,e,ek->ei", J2, w, e)
    E = edges.i.shape[0]
    # one-hot matmul assembly (scatter-free; see _assemble_camera_system)
    Oi = (edges.i[:, None] == jnp.arange(K)).astype(Hii.dtype)  # (E,K)
    Oj = (edges.j[:, None] == jnp.arange(K)).astype(Hii.dtype)
    diag = (jnp.einsum("ek,ex->kx", Oi, Hii.reshape(E, 36))
            + jnp.einsum("ek,ex->kx", Oj, Hjj.reshape(E, 36)))
    Z = Oj[:, :, None] * Hij.reshape(E, 1, 36)                  # (E,K,36)
    cross = jnp.einsum("ek,elx->klx", Oi, Z)                    # at (i,j)
    cross_t = cross.reshape(K, K, 6, 6).transpose(1, 0, 3, 2).reshape(K, K, 36)
    Hcc = cross + cross_t + jnp.eye(K)[:, :, None] * diag[:, None, :]
    bc = (jnp.einsum("ek,ex->kx", Oi, bi)
          + jnp.einsum("ek,ex->kx", Oj, bj))
    chi2 = jnp.sum(e * e, axis=-1) * edges.info
    return Hcc, bc, chi2


def _solve_reduced(Hcc, bc, fixed, lam_c):
    """Dense solve of the reduced camera system with damping and gauge pinning.
    ``Hcc`` arrives flat (K, K, 36) — see _accumulate_family's layout note."""
    K = Hcc.shape[0]
    # Levenberg damping on the diagonal blocks
    diag = Hcc[jnp.arange(K), jnp.arange(K)].reshape(K, 6, 6)
    damp = lam_c * jnp.eye(6) * jnp.maximum(
        jnp.trace(diag, axis1=-2, axis2=-1)[..., None, None] / 6.0, 1e-6
    )
    Hcc = Hcc.at[jnp.arange(K), jnp.arange(K)].add(damp.reshape(K, 36))
    H = Hcc.reshape(K, K, 6, 6).transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    b = bc.reshape(6 * K)
    # pin fixed poses: identity rows/cols, zero rhs
    fmask = jnp.repeat(fixed, 6)
    H = jnp.where(fmask[:, None] | fmask[None, :], 0.0, H)
    H = H + jnp.diag(jnp.where(fmask, 1.0, 1e-9))
    b = jnp.where(fmask, 0.0, b)
    # H = J^T W J + LM damping with pinned gauge rows -> symmetric positive
    # definite: solve by Cholesky.  jnp.linalg.solve's pivoted LU is the
    # dominant REPLICATED per-iteration cost of the sharded BA (it cannot be
    # amortized by landmark sharding — VERDICT r4 missing #3); Cholesky at
    # 6K=1536 is ~2x the FLOPs headroom and lowers far better on TPU.
    L = jax.lax.linalg.cholesky(H)
    dx = jax.lax.linalg.triangular_solve(
        L, jax.lax.linalg.triangular_solve(
            L, b[:, None], left_side=True, lower=True),
        left_side=True, lower=True, transpose_a=True)[:, 0]
    # fall back to LU only if the factorization failed (indefinite H from a
    # catastrophic linearization — never seen, but LM must not emit NaNs: the
    # step would be silently "accepted" by a NaN-poisoned error compare)
    bad = ~jnp.all(jnp.isfinite(dx))
    dx = jax.lax.cond(bad, lambda _: jnp.linalg.solve(H, b),
                      lambda _: dx, None)
    return dx.reshape(K, 6)


def _chi2_total(chi2_f, wf_act, chi2_b, wb_act, chi2_o, huber_delta, use_huber):
    d2 = huber_delta * huber_delta

    def rho(c):
        return jnp.where(use_huber & (c > d2), 2.0 * huber_delta * jnp.sqrt(jnp.maximum(c, 0.0)) - d2, c)

    return jnp.sum(rho(chi2_f) * wf_act) + jnp.sum(rho(chi2_b) * wb_act) + jnp.sum(chi2_o)


def bundle_adjust(
    cam: CameraConfig,
    ba: BAConfig,
    poses0,                      # (K, 7) Tcw per KF slot
    fixed,                       # (K,) bool
    front: PointBlocks,
    bird: PointBlocks,
    odom: OdomEdges,
    n_iters_1: Optional[int] = None,
    n_iters_2: Optional[int] = None,
    axis_name: Optional[str] = None,
) -> BAResult:
    """Two-stage LM like the reference local BA (5 iters, outlier re-gate,
    10 more without outliers, ``Optimizer.cc:2511-2572``), then final
    classification (``:2574-2610``).

    Distributed mode (``axis_name`` set, called under ``shard_map``): the point
    blocks are sharded along their leading axis across the mesh axis; the
    per-shard reduced camera contributions (Hcc, bc) and the total chi2 are
    ``psum``-combined over ICI; poses and the dense reduced solve are
    replicated; landmark back-substitution stays shard-local.  This is the
    keyframe/point-block Schur reduction of SURVEY.md §7 step 7."""

    def _ax_sum(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x
    it1 = ba.local_ba_iters_1 if n_iters_1 is None else n_iters_1
    it2 = ba.local_ba_iters_2 if n_iters_2 is None else n_iters_2
    K = poses0.shape[0]

    f_act0 = front.valid & front.point_valid[:, None]
    b_act0 = bird.valid & bird.point_valid[:, None]

    def chi2_of(poses, fXw, bXw, f_act, b_act, use_huber):
        c2f, _ = _family_chi2(cam, poses, front._replace(Xw=fXw), ba.w_front, True)
        c2b, _ = _family_chi2(None, poses, bird._replace(Xw=bXw), ba.w_bird, False)
        c2o = _odom_chi2(poses, odom, ba.w_pose)
        # family chi2 is shard-local (psum); odometry edges are replicated
        fam = _chi2_total(c2f, f_act, c2b, b_act, jnp.zeros((0,)), ba.huber_delta, use_huber)
        return _ax_sum(fam) + jnp.sum(c2o)

    def lm_stage(poses, fXw, bXw, f_act, b_act, n_iters, use_huber):
        f_actf = f_act.astype(jnp.float32)
        b_actf = b_act.astype(jnp.float32)

        def step(carry, _):
            poses, fXw, bXw, lam, err = carry
            fb = front._replace(Xw=fXw)
            bb = bird._replace(Xw=bXw)
            e_f, Jc_f, Jp_f, w_f, _ = _family_terms(cam, poses, fb, ba.w_front, ba.huber_delta, use_huber, f_actf, True)
            e_b, Jc_b, Jp_b, w_b, _ = _family_terms(None, poses, bb, ba.w_bird, ba.huber_delta, use_huber, b_actf, False)
            Hcc_f, bc_f, Hppi_f, bp_f, Hcp_f = _accumulate_family(K, poses, e_f, Jc_f, Jp_f, w_f, front.kf_idx, lam)
            Hcc_b, bc_b, Hppi_b, bp_b, Hcp_b = _accumulate_family(K, poses, e_b, Jc_b, Jp_b, w_b, bird.kf_idx, lam)
            Hcc_o, bc_o, _ = _odom_terms(K, poses, odom, ba.w_pose)
            Hcc = _ax_sum(Hcc_f + Hcc_b) + Hcc_o
            bc = _ax_sum(bc_f + bc_b) + bc_o
            dxc = _solve_reduced(Hcc, bc, fixed, lam)
            # back-substitute landmarks: dx_p = Hpp^-1 (b_p - Hpc dx_c)
            def backsub(Hppi, bp, Hcp, kf_idx):
                corr = jnp.einsum("pmij,pmi->pj", Hcp, dxc[kf_idx])
                return jnp.einsum("pij,pj->pi", Hppi, bp - corr)

            dxf = backsub(Hppi_f, bp_f, Hcp_f, front.kf_idx)
            dxb = backsub(Hppi_b, bp_b, Hcp_b, bird.kf_idx)
            poses_new = se3.retract(poses, dxc)
            poses_new = jnp.where(fixed[:, None], poses, poses_new)
            fXw_new = fXw + dxf * front.point_valid[:, None]
            bXw_new = bXw + dxb * bird.point_valid[:, None]
            err_new = chi2_of(poses_new, fXw_new, bXw_new, f_actf, b_actf, use_huber)
            ok = jnp.isfinite(err_new) & (err_new < err)
            poses = jnp.where(ok, poses_new, poses)
            fXw = jnp.where(ok, fXw_new, fXw)
            bXw = jnp.where(ok, bXw_new, bXw)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-10, 1e4)
            err = jnp.where(ok, err_new, err)
            return (poses, fXw, bXw, lam, err), None

        init_err = chi2_of(poses, fXw, bXw, f_actf, b_actf, use_huber)
        (poses, fXw, bXw, _, _), _ = jax.lax.scan(
            step, (poses, fXw, bXw, jnp.float32(1e-4), init_err), None, length=n_iters
        )
        return poses, fXw, bXw

    # stage 1
    poses, fXw, bXw = lm_stage(poses0, front.Xw, bird.Xw, f_act0, b_act0, it1, True)
    # outlier re-gate (chi2 > 5.991 or negative depth — Optimizer.cc:2531-2556)
    c2f, f_depth = _family_chi2(cam, poses, front._replace(Xw=fXw), ba.w_front, True)
    c2b, _ = _family_chi2(None, poses, bird._replace(Xw=bXw), ba.w_bird, False)
    f_act1 = f_act0 & (c2f <= ba.chi2_mono_ba * ba.w_front) & f_depth
    b_act1 = b_act0 & (c2b <= ba.chi2_bird * ba.w_bird)
    # stage 2: no robust kernel (reference sets edges level-1 and re-optimizes)
    poses, fXw, bXw = lm_stage(poses, fXw, bXw, f_act1, b_act1, it2, False)
    # final classification
    c2f, f_depth = _family_chi2(cam, poses, front._replace(Xw=fXw), ba.w_front, True)
    c2b, _ = _family_chi2(None, poses, bird._replace(Xw=bXw), ba.w_bird, False)
    f_in = f_act0 & (c2f <= ba.chi2_mono_ba * ba.w_front) & f_depth
    b_in = b_act0 & (c2b <= ba.chi2_bird * ba.w_bird)
    return BAResult(poses, fXw, bXw, f_in, b_in)
