"""ORB orientation (intensity centroid) and rBRIEF descriptors, batched over
keypoint patches.

Reference: ``IC_Angle`` (``ORBextractor.cc:77``) computes atan2(m01, m10) over a
circular patch of radius 15; ``computeOrbDescriptor`` (``:108``) samples 256
learned point pairs rotated by the keypoint angle from the Gaussian-blurred image.

We do NOT copy the reference's learned ``bit_pattern_31_`` table: descriptors only
need internal consistency within this framework (matching our own frames), so the
pair pattern is generated once from a fixed PRNG seed with the classic BRIEF
recipe (isotropic Gaussian, sigma = patch/5, clipped to radius 13 so rotated
samples stay inside the radius-15 patch).  Descriptors are returned both
bit-packed (N, 8) uint32 — the storage format — and as +/-1 bfloat16 (N, 256) —
the MXU matmul format used by the Hamming matcher.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 31
HALF = 15  # patch radius; patches are (31, 31) centered on the keypoint
N_BITS = 256


@functools.lru_cache(maxsize=1)
def _circular_mask() -> np.ndarray:
    yy, xx = np.mgrid[-HALF : HALF + 1, -HALF : HALF + 1]
    return ((yy * yy + xx * xx) <= HALF * HALF).astype(np.float32)


@functools.lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """(256, 4) int32: (y1, x1, y2, x2) sample-pair offsets, fixed for all time.

    Gaussian BRIEF pairs (sigma = PATCH/5 = 6.2), deterministic seed, clipped to
    radius <= 13 so any in-plane rotation keeps samples inside the patch circle.
    """
    rng = np.random.RandomState(20240817)
    pts = []
    while len(pts) < 2 * N_BITS:
        p = rng.randn(2) * (PATCH / 5.0)
        if p[0] ** 2 + p[1] ** 2 <= 13.0**2:
            pts.append(p)
    pts = np.asarray(pts, dtype=np.float32)
    return np.concatenate([pts[0::2], pts[1::2]], axis=1)  # (256, 4) = y1 x1 y2 x2


def orientations(patches):
    """(N, 31, 31) intensity patches -> (N,) angle radians via intensity centroid.

    m10 = sum(x * I), m01 = sum(y * I) over the circular mask; angle = atan2(m01, m10)
    (``ORBextractor.cc:77-106`` semantics; coordinates centered on the keypoint).
    """
    mask = jnp.asarray(_circular_mask())
    coords = jnp.arange(-HALF, HALF + 1, dtype=jnp.float32)
    I = patches * mask[None]
    m10 = jnp.sum(I * coords[None, None, :], axis=(1, 2))
    m01 = jnp.sum(I * coords[None, :, None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def descriptors(blurred_patches, angles):
    """rBRIEF: rotate the pair pattern by each keypoint angle, nearest-sample the
    blurred patch, compare.  Returns bits (N, 256) uint8 in {0, 1}.
    """
    pat = jnp.asarray(brief_pattern())  # (256, 4)
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # (N,)
    y1, x1, y2, x2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]

    def rot(y, x):
        # steered BRIEF rotation (same form as computeOrbDescriptor's
        # GET_VALUE macro: x' = x cos - y sin, y' = x sin + y cos)
        ry = x[None, :] * sa[:, None] + y[None, :] * ca[:, None]
        rx = x[None, :] * ca[:, None] - y[None, :] * sa[:, None]
        return ry, rx  # (N, 256)

    ry1, rx1 = rot(y1, x1)
    ry2, rx2 = rot(y2, x2)

    def sample(patches, ry, rx):
        iy = jnp.clip(jnp.round(ry).astype(jnp.int32) + HALF, 0, PATCH - 1)
        ix = jnp.clip(jnp.round(rx).astype(jnp.int32) + HALF, 0, PATCH - 1)
        flat = patches.reshape(patches.shape[0], -1)  # (N, 961)
        idx = iy * PATCH + ix  # (N, 256)
        return jnp.take_along_axis(flat, idx, axis=1)

    v1 = sample(blurred_patches, ry1, rx1)
    v2 = sample(blurred_patches, ry2, rx2)
    return (v1 < v2).astype(jnp.uint8)


def pack_bits(bits):
    """(N, 256) {0,1} -> (N, 8) uint32 (storage format)."""
    b = bits.reshape(bits.shape[0], 8, 32).astype(jnp.uint32)
    w = jnp.asarray((1 << np.arange(32)).astype(np.uint32))
    return jnp.sum(b * w[None, None, :], axis=-1)


def unpack_bits(packed):
    """(N, 8) uint32 -> (N, 256) {0,1} uint8."""
    w = jnp.asarray(np.arange(32, dtype=np.uint32))
    bits = (packed[:, :, None] >> w[None, None, :]) & jnp.uint32(1)
    return bits.reshape(packed.shape[0], 256).astype(jnp.uint8)


def bits_to_pm1(bits, dtype=jnp.bfloat16):
    """{0,1} bits -> +/-1 matmul operand.  With a = 2b1-1, b = 2b2-1 (+/-1 vectors),
    hamming(b1, b2) = (256 - a.b) / 2 — one MXU matmul gives the full distance
    matrix.  This is the TPU-native replacement for XOR+popcount
    (``ORBmatcher::DescriptorDistance``, ``ORBmatcher.cc:1951-1967``)."""
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(dtype)


def hamming_matrix(pm1_a, pm1_b):
    """(N1, 256) x (N2, 256) +/-1 -> (N1, N2) float32 Hamming distances via MXU."""
    dot = jnp.dot(pm1_a, pm1_b.T, preferred_element_type=jnp.float32)
    return 0.5 * (N_BITS - dot)
