"""Nullspace extraction robustness (solvers/linalg.py).

The 8-point/DLT/EPnP systems all need smallest right singular vectors in f32;
eigh(A^T A) squares the condition number and measurably fails on TPU (median
nullvector error ~1e-1 on noisy 8-point samples).  These tests pin the QR+SVD
path to f64-reference accuracy and check batching/ordering contracts.
"""

import numpy as np
import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.solvers.linalg import (
    nullvec, smallest_right_singular_vectors,
)


def _ref_smallest(A64, k):
    _, _, Vt = np.linalg.svd(A64)
    return Vt[::-1][:k]


class TestNullvec:
    def test_exact_nullspace(self):
        rng = np.random.RandomState(0)
        B = rng.randn(12, 8).astype(np.float32)
        v = rng.randn(9).astype(np.float32)
        v /= np.linalg.norm(v)
        # A has exact nullvector v: rows orthogonal to v
        Q = np.linalg.qr(np.concatenate([v[:, None], rng.randn(9, 8)], 1))[0]
        A = (B @ Q[:, 1:].T).astype(np.float32)
        f = np.asarray(nullvec(jnp.asarray(A)))
        err = min(np.linalg.norm(f - v), np.linalg.norm(f + v))
        assert err < 1e-5, err

    def test_matches_f64_reference_ill_conditioned(self):
        rng = np.random.RandomState(1)
        errs = []
        for _ in range(20):
            # pixel-scale columns mixed with unit columns: condition ~1e6
            A = rng.randn(16, 9)
            A[:, :3] *= 1e3
            A32 = A.astype(np.float32)
            fref = _ref_smallest(A32.astype(np.float64), 1)[0]
            f = np.asarray(nullvec(jnp.asarray(A32)), np.float64)
            f /= np.linalg.norm(f)
            errs.append(min(np.linalg.norm(f - fref), np.linalg.norm(f + fref)))
        assert np.median(errs) < 1e-3, errs

    def test_k_ordering_smallest_first(self):
        rng = np.random.RandomState(2)
        U = np.linalg.qr(rng.randn(12, 12))[0]
        V = np.linalg.qr(rng.randn(9, 9))[0]
        s = np.array([9, 8, 7, 6, 5, 4, 3, 2e-2, 1e-3])
        A = (U[:, :9] * s) @ V.T
        out = np.asarray(smallest_right_singular_vectors(jnp.asarray(A, jnp.float32), 4))
        for i, col in enumerate([8, 7, 6, 5]):
            v = V[:, col]
            err = min(np.linalg.norm(out[i] - v), np.linalg.norm(out[i] + v))
            assert err < 1e-3, (i, err)

    def test_batched(self):
        rng = np.random.RandomState(3)
        A = rng.randn(5, 8, 9).astype(np.float32)
        out = np.asarray(jax.vmap(nullvec)(jnp.asarray(A)))
        out2 = np.asarray(nullvec(jnp.asarray(A)))  # implicit batching dims
        for i in range(5):
            fref = _ref_smallest(A[i].astype(np.float64), 1)[0]
            for f in (out[i], out2[i]):
                f = f / np.linalg.norm(f)
                assert min(np.linalg.norm(f - fref), np.linalg.norm(f + fref)) < 1e-4
