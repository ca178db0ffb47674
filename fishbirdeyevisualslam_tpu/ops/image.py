"""Image primitives: grayscale, resize pyramid, separable Gaussian blur.

Replaces the reference's OpenCV usage (``cv::cvtColor`` in ``Tracking.cc:292-339``,
``ComputePyramid`` in ``ORBextractor.cc:1107``, ``GaussianBlur(7,7,2,2)`` before
descriptor sampling in ``ORBextractor.cc:1080-1100``) with XLA-fusable jnp ops.
Images are float32 (0..255), shape (H, W); all shapes static.
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_gray(img):
    """(H, W, 3) uint8/float -> (H, W) float32 luma (ITU-R BT.601, like OpenCV)."""
    img = img.astype(jnp.float32)
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float) -> List[Tuple[int, int]]:
    return [(int(round(h / scale**i)), int(round(w / scale**i))) for i in range(n_levels)]


def build_pyramid(img, n_levels: int, scale: float):
    """List of n_levels images, level i downscaled by scale**i (bilinear, like
    cv::resize INTER_LINEAR in ``ORBextractor.cc:1107``)."""
    h, w = img.shape
    out = [img]
    for lh, lw in pyramid_shapes(h, w, n_levels, scale)[1:]:
        out.append(jax.image.resize(img, (lh, lw), method="linear"))
    return out


@functools.lru_cache(maxsize=8)
def _gauss_kernel(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian, edge-replicate padding (close to cv BORDER_REFLECT_101)."""
    k = jnp.asarray(_gauss_kernel(ksize, sigma))
    r = ksize // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    # vertical pass: correlate along axis 0
    x = jnp.sum(
        jnp.stack([x[i : i + img.shape[0], :] for i in range(ksize)], axis=0)
        * k[:, None, None],
        axis=0,
    )
    x = jnp.pad(x, ((0, 0), (r, r)), mode="edge")
    x = jnp.sum(
        jnp.stack([x[:, i : i + img.shape[1]] for i in range(ksize)], axis=0)
        * k[:, None, None],
        axis=0,
    )
    return x


def scale_factors(n_levels: int, scale: float):
    return jnp.asarray([scale**i for i in range(n_levels)], dtype=jnp.float32)


def per_level_budget(n_features: int, n_levels: int, scale: float) -> List[int]:
    """Distribute the feature budget over pyramid levels with geometric decay
    (factor 1/scale), mirroring ORB-SLAM2's per-level allocation: finer levels get
    proportionally more features (``ORBextractor.cc`` ctor semantics)."""
    inv = 1.0 / scale
    total = sum(inv**i for i in range(n_levels))
    raw = [n_features * (inv**i) / total for i in range(n_levels)]
    out = [int(math.floor(r)) for r in raw]
    # hand the rounding leftovers to the finest levels
    deficit = n_features - sum(out)
    for i in range(deficit):
        out[i % n_levels] += 1
    return out
