"""Parity: fused MXU projection-match kernel vs matcher.match (op-graph path).

Interpret mode on CPU; the TPU bench exercises the compiled kernel.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.ops import matcher
from fishbirdeyevisualslam_tpu.slam.frame import desc_pm1_from_packed
from fishbirdeyevisualslam_tpu.ops.pallas_matcher import fused_projection_match

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier


def make_problem(na=300, nb=700, seed=0):
    rng = np.random.RandomState(seed)
    bits_a = jnp.asarray(rng.randint(0, 2**32, (na, 8), dtype=np.uint64).astype(np.uint32))
    # make some b rows near-duplicates of a rows so real matches exist
    bits_b_np = rng.randint(0, 2**32, (nb, 8), dtype=np.uint64).astype(np.uint32)
    bits_b_np[:na] = np.asarray(bits_a)
    flip = rng.randint(0, 2**32, (na, 8), dtype=np.uint64).astype(np.uint32)
    bits_b_np[:na] ^= flip & rng.randint(0, 2, (na, 8)).astype(np.uint32)  # few flips
    bits_b = jnp.asarray(bits_b_np)
    uv_a = jnp.asarray(rng.uniform(0, 900, (na, 2)).astype(np.float32))
    uv_b = jnp.asarray(
        np.concatenate([np.asarray(uv_a) + rng.randn(na, 2).astype(np.float32) * 3,
                        rng.uniform(0, 900, (nb - na, 2)).astype(np.float32)]))
    oct_a = jnp.asarray(rng.randint(0, 8, na).astype(np.int32))
    pred_b = jnp.asarray(rng.randint(0, 8, nb).astype(np.float32))
    valid_a = jnp.asarray(rng.rand(na) > 0.1)
    valid_b = jnp.asarray(rng.rand(nb) > 0.1)
    radius_b = jnp.asarray(rng.uniform(5, 40, nb).astype(np.float32))
    return (desc_pm1_from_packed(bits_a), uv_a, oct_a, valid_a,
            desc_pm1_from_packed(bits_b), uv_b, radius_b, pred_b, valid_b)


def dense_reference(pm1_a, uv_a, oct_a, valid_a, pm1_b, uv_b, radius_b, pred_b,
                    valid_b, max_dist, level_window, ratio=None):
    d_uv = jnp.abs(uv_a[:, None, :] - uv_b[None, :, :])
    compat = (d_uv[..., 0] <= radius_b[None, :]) & (d_uv[..., 1] <= radius_b[None, :])
    if level_window:
        d_oct = oct_a[:, None].astype(jnp.float32) - pred_b[None, :]
        compat = compat & (d_oct >= -1) & (d_oct <= 1)
    compat = compat & valid_a[:, None] & valid_b[None, :]
    return matcher.match(pm1_a, pm1_b, compat, max_dist=max_dist, ratio=ratio)


@pytest.mark.parametrize("level_window", [False, True])
@pytest.mark.parametrize("ratio", [None, 0.8])
def test_parity(level_window, ratio):
    prob = make_problem()
    ref = dense_reference(*prob, max_dist=60.0, level_window=level_window, ratio=ratio)
    fused = fused_projection_match(*prob, max_dist=60.0, level_window=level_window,
                                   ratio=ratio, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.ok), np.asarray(fused.ok))
    np.testing.assert_array_equal(np.asarray(ref.idx), np.asarray(fused.idx))
    np.testing.assert_allclose(np.asarray(ref.dist), np.asarray(fused.dist))


@pytest.mark.parametrize("level_window", [False, True])
def test_dual_radius_parity(level_window):
    from fishbirdeyevisualslam_tpu.ops.pallas_matcher import (
        fused_projection_match_dual,
    )
    prob = make_problem(seed=4)
    res1, res2 = fused_projection_match_dual(
        *prob, max_dist=60.0, r2_scale=2.0, level_window=level_window,
        interpret=True)
    for res, scale in ((res1, 1.0), (res2, 2.0)):
        p = list(prob)
        p[6] = prob[6] * scale
        ref = dense_reference(*p, max_dist=60.0, level_window=level_window)
        np.testing.assert_array_equal(np.asarray(ref.ok), np.asarray(res.ok))
        np.testing.assert_array_equal(np.asarray(ref.idx), np.asarray(res.idx))
        np.testing.assert_allclose(np.asarray(ref.dist), np.asarray(res.dist))


def test_all_invalid_targets():
    prob = list(make_problem(na=64, nb=128, seed=2))
    prob[8] = jnp.zeros(128, bool)  # valid_b
    fused = fused_projection_match(*prob, max_dist=60.0, interpret=True)
    assert not bool(jnp.any(fused.ok))
    assert bool(jnp.all(fused.idx == -1))


def test_scalar_radius_broadcast():
    prob = list(make_problem(na=64, nb=128, seed=3))
    prob[6] = jnp.float32(25.0)  # scalar radius
    ref = dense_reference(prob[0], prob[1], prob[2], prob[3], prob[4], prob[5],
                          jnp.full((128,), 25.0), prob[7], prob[8],
                          max_dist=60.0, level_window=False)
    fused = fused_projection_match(*prob, max_dist=60.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.idx), np.asarray(fused.idx))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
