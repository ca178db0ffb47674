"""Fused FAST+NMS Pallas kernel vs the XLA reference implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.ops import fast as fast_ops
from fishbirdeyevisualslam_tpu.ops.pallas_fast import fast_detect

pytestmark = pytest.mark.heavy  # excluded from the <2 min smoke tier


class TestPallasFast:
    @pytest.mark.parametrize("shape", [(64, 128), (100, 200), (57, 131)])
    def test_parity_with_xla_detect(self, shape):
        rng = np.random.RandomState(3)
        img = jnp.asarray(rng.rand(*shape).astype(np.float32) * 255)
        ref_score, ref_raw = fast_ops.detect(img, 15.0, 5.0, with_raw=True)
        score, raw = fast_detect(img, 15.0, 5.0, interpret=True)
        np.testing.assert_allclose(np.asarray(score), np.asarray(ref_score),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(raw), np.asarray(ref_raw),
                                   rtol=1e-5, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
