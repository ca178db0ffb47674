"""Pallas Hamming kernels vs numpy oracles (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.ops import orb
from fishbirdeyevisualslam_tpu.ops.pallas_matcher import (
    hamming_matrix_packed, fused_masked_match,
)


def _rand_bits(rng, n):
    return jnp.asarray(rng.randint(0, 2, (n, 256)).astype(np.uint8))


class TestHammingPacked:
    def test_matches_oracle(self):
        rng = np.random.RandomState(0)
        a_bits = _rand_bits(rng, 100)
        b_bits = _rand_bits(rng, 130)
        D = np.asarray(hamming_matrix_packed(
            orb.pack_bits(a_bits), orb.pack_bits(b_bits), interpret=True))
        expect = (np.asarray(a_bits)[:, None, :] != np.asarray(b_bits)[None, :, :]).sum(-1)
        np.testing.assert_array_equal(D, expect)

    def test_agrees_with_mxu_path(self):
        rng = np.random.RandomState(1)
        a_bits = _rand_bits(rng, 64)
        b_bits = _rand_bits(rng, 64)
        D1 = np.asarray(hamming_matrix_packed(
            orb.pack_bits(a_bits), orb.pack_bits(b_bits), interpret=True))
        D2 = np.asarray(orb.hamming_matrix(
            orb.bits_to_pm1(a_bits), orb.bits_to_pm1(b_bits)))
        np.testing.assert_array_equal(D1, D2)


class TestFusedMatch:
    def test_matches_oracle(self):
        rng = np.random.RandomState(2)
        na, nb, r = 200, 600, 60.0
        a_bits = _rand_bits(rng, na)
        b_bits = _rand_bits(rng, nb)
        uv_a = jnp.asarray(rng.rand(na, 2).astype(np.float32) * 400)
        uv_b = jnp.asarray(rng.rand(nb, 2).astype(np.float32) * 400)
        valid_b = jnp.asarray(rng.rand(nb) > 0.2)
        best, second, idx = fused_masked_match(
            orb.pack_bits(a_bits), uv_a, orb.pack_bits(b_bits), uv_b, valid_b, r,
            interpret=True)
        D = (np.asarray(a_bits)[:, None, :] != np.asarray(b_bits)[None, :, :]).sum(-1).astype(np.float64)
        du = np.abs(np.asarray(uv_a)[:, 0, None] - np.asarray(uv_b)[None, :, 0])
        dv = np.abs(np.asarray(uv_a)[:, 1, None] - np.asarray(uv_b)[None, :, 1])
        ok = (du <= r) & (dv <= r) & np.asarray(valid_b)[None, :]
        D = np.where(ok, D, 1e9)
        e_best = D.min(1)
        e_idx = np.where(e_best < 1e9, D.argmin(1), -1)
        np.testing.assert_allclose(np.asarray(best), e_best)
        np.testing.assert_array_equal(np.asarray(idx), e_idx)
        D2 = D.copy()
        D2[np.arange(na), np.where(e_idx >= 0, e_idx, 0)] = 1e9
        np.testing.assert_allclose(np.asarray(second), np.minimum(D2.min(1), 1e9))

    def test_no_valid_targets(self):
        rng = np.random.RandomState(3)
        a_bits = _rand_bits(rng, 20)
        b_bits = _rand_bits(rng, 20)
        best, second, idx = fused_masked_match(
            orb.pack_bits(a_bits), jnp.zeros((20, 2)),
            orb.pack_bits(b_bits), jnp.zeros((20, 2)),
            jnp.zeros(20, bool), 50.0, interpret=True)
        assert (np.asarray(idx) == -1).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
