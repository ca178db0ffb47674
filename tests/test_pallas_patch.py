"""Parity: Pallas patch-gather kernel vs vmap(dynamic_slice) (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.ops.pallas_patch import extract_patches


@pytest.mark.parametrize("n,side", [(300, 37), (128, 31), (17, 37)])
def test_parity(n, side):
    rng = np.random.RandomState(n)
    img = jnp.asarray(rng.rand(436, 986).astype(np.float32))
    yx = jnp.asarray(np.stack([
        rng.randint(0, 436 - side, n), rng.randint(0, 986 - side, n)
    ], -1).astype(np.int32))
    ref = jax.vmap(lambda p: jax.lax.dynamic_slice(img, (p[0], p[1]), (side, side)))(yx)
    got = extract_patches(img, yx, side, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_corner_starts():
    # extreme starts: (0,0) and the maximal in-bounds corner
    img = jnp.asarray(np.arange(436 * 986, dtype=np.float32).reshape(436, 986))
    yx = jnp.asarray([[0, 0], [436 - 37, 986 - 37]], jnp.int32)
    ref = jax.vmap(lambda p: jax.lax.dynamic_slice(img, (p[0], p[1]), (37, 37)))(yx)
    got = extract_patches(img, yx, 37, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
