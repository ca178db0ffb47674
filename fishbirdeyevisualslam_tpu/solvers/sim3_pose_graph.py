"""Sim(3) pose-graph optimization — the scale-drift-aware essential graph.

Re-implements the ``bFixScale = false`` branch of
``Optimizer::OptimizeEssentialGraph`` (``src/Optimizer.cc:1168-1558``): vertices
are ``Sim3`` world-to-camera transforms (7 dof: rotation, translation, log
scale), edges constrain relative Sim3 poses, and the solver is
Levenberg–Marquardt on the product manifold.  The reference's default build
pins s = 1 (``bFixScale = true``, ``src/System.cc:102``) and runs the SE3
variant in ``solvers.pose_graph``; this module covers the monocular
scale-drift regime (pure mono, no odometry to anchor scale).

TPU-first shape: the graph is small (K <= a few hundred vertices), so instead
of sparse block elimination the full Jacobian is formed by forward-mode
autodiff of the batched residual against a (K, 7) tangent perturbation and the
normal equations are one dense solve — a single fused XLA program with a
``lax.scan`` over LM iterations, no host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.geometry import se3, sim3


class Sim3Edges(NamedTuple):
    i: jnp.ndarray        # (E,) int32 first vertex
    j: jnp.ndarray        # (E,) int32 second vertex
    S_meas: jnp.ndarray   # (E, 8) measured S_i * S_j^-1 (relative Sim3)
    info: jnp.ndarray     # (E,) scalar information weight
    valid: jnp.ndarray    # (E,) bool


def _edge_residuals(S, edges: Sim3Edges):
    """(E, 7) tangent-space residuals log(S_meas^-1 * S_i * S_j^-1) — the Sim3
    analog of the SE3 relative-pose error (g2o EdgeSim3 semantics)."""
    Si = S[edges.i]
    Sj = S[edges.j]
    rel = sim3.compose(Si, sim3.inverse(Sj))
    err = sim3.compose(sim3.inverse(edges.S_meas), rel)
    return sim3.log(err)


def optimize_sim3_pose_graph(
    S0,                  # (K, 8) initial Sim3 world-to-camera per vertex
    fixed,               # (K,) bool — gauge (the loop KF, Optimizer.cc:1217)
    edges: Sim3Edges,
    n_iters: int = 20,
    lambda0: float = 1e-6,
):
    """LM over the product Sim3 manifold; returns optimized (K, 8).

    Fixed vertices contribute residuals but receive no update (their tangent
    rows/cols are pinned by a large diagonal, matching g2o's setFixed).
    """
    K = S0.shape[0]
    D = 7 * K
    w = jnp.where(edges.valid, edges.info, 0.0)
    free = (~fixed).astype(S0.dtype)

    def residual_at(delta_flat, S):
        delta = delta_flat.reshape(K, 7) * free[:, None]
        S_new = jax.vmap(sim3.retract)(S, delta)
        return (_edge_residuals(S_new, edges) * jnp.sqrt(w)[:, None]).reshape(-1)

    def step(carry, _):
        S, lam = carry
        r0 = residual_at(jnp.zeros(D, S.dtype), S)
        J = jax.jacfwd(residual_at)(jnp.zeros(D, S.dtype), S)   # (E*7, D)
        H = J.T @ J
        g = J.T @ r0
        # pin fixed vertices + LM damping
        pin = jnp.repeat(jnp.where(fixed, 1e12, 0.0), 7)
        Hd = H + jnp.diag(lam * (jnp.diag(H) + 1e-9) + pin)
        dx = -jnp.linalg.solve(Hd, g)
        S_new = jax.vmap(sim3.retract)(S, dx.reshape(K, 7) * free[:, None])
        c_new = jnp.sum(residual_at(jnp.zeros(D, S.dtype), S_new) ** 2)
        c_old = jnp.sum(r0 ** 2)
        accept = c_new < c_old
        S = jnp.where(accept, S_new, S)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (S, lam), c_old

    (S_opt, _), _ = jax.lax.scan(step, (S0, jnp.asarray(lambda0, S0.dtype)), None,
                                 length=n_iters)
    return S_opt


def carry_points_sim3(points, ref_kf, S_old, S_new):
    """Transport landmarks with their reference KF's Sim3 correction:
    X_new = S_new^-1 * S_old * X_old (with scale; ``Optimizer.cc:1515-1556``,
    ``LoopClosing.cc:506-525``)."""
    corr = jax.vmap(lambda a, b: sim3.compose(sim3.inverse(b), a))(
        S_old[ref_kf], S_new[ref_kf])
    return jax.vmap(sim3.transform)(corr, points)
