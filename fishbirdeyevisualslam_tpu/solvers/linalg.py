"""Numerically-robust small-nullspace extraction for f32 TPU.

Every DLT-style estimator here (8-point F, 4-point H, EPnP's 12x12 system,
projection-matrix DLT) needs the right singular vector(s) of a thin (N, M)
design matrix A for the SMALLEST singular values.  The textbook route
``eigh(A.T @ A)`` squares the condition number, and on TPU the f32 eigh then
returns nullvectors with errors around 1e-1 on noisy 8-point samples
(measured; CPU LAPACK f32 hides this).  QR-factorizing A first and running the
SVD on the small (M, M) triangular factor keeps kappa(R) = kappa(A) and lands
at ~1e-6 error in pure f32 — no f64 emulation, no extra HBM traffic, and both
factorizations batch cleanly under vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def smallest_right_singular_vectors(A, k: int = 1):
    """(k, M) right singular vectors of ``A`` for the k smallest singular
    values, ordered smallest-first.  ``A`` may be (..., N, M) with N >= k;
    batching dims are preserved: output (..., k, M)."""
    _, R = jnp.linalg.qr(A)          # (..., min(N,M), M); kappa not squared
    _, _, Vt = jnp.linalg.svd(R)     # full_matrices=True -> Vt (..., M, M)
    return Vt[..., ::-1, :][..., :k, :]


def nullvec(A):
    """(..., M) right singular vector of ``A`` for the smallest singular value."""
    return smallest_right_singular_vectors(A, 1)[..., 0, :]


def inv3(A):
    """Closed-form batched 3x3 inverse (adjugate / det).

    ``jnp.linalg.inv``/``solve`` lower to a blocked-LU custom call that is far
    slower than elementwise VPU math for thousands of tiny matrices on TPU
    (measured ~19 ms for 16k 3x3s vs ~1 ms closed-form)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    adj = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c10, c11, c12], axis=-1),
        jnp.stack([c20, c21, c22], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def solve3(A, b):
    """Batched 3x3 solve via the closed-form inverse (see ``inv3``)."""
    return jnp.einsum("...ij,...j->...i", inv3(A), b)
