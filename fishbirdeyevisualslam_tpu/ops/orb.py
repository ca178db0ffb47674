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


# Steered-BRIEF rotation quantization.  The ORB paper (and the reference's
# 2*pi/30 steering) uses 30 bins = 12 deg; 32 keeps that granularity at a
# power of two.  Bin count scales the descriptor matmul below linearly — at 64
# bins it measured 0.75 ms/frame of the tracking step on v5e, at 32 half that.
N_ANGLE_BINS = 32


@functools.lru_cache(maxsize=4)
def _binned_sample_tables(n_bins: int):
    """Per-bin rotated sample indices: (n_bins, 256) int32 flat patch indices
    for each of the two points of every BRIEF pair.

    The original ORB quantizes the steering angle to 2*pi/30 and precomputes
    rotated patterns (the reference's ``computeOrbDescriptor`` recomputes
    cos/sin per keypoint, ``ORBextractor.cc:108`` — a scalar-loop luxury); the
    lookup-table form is also what makes the matmul sampler below possible.
    """
    pat = brief_pattern()
    centers = np.arange(n_bins) * (2.0 * np.pi / n_bins)
    ca, sa = np.cos(centers), np.sin(centers)

    def rot_idx(y, x):
        ry = x[None, :] * sa[:, None] + y[None, :] * ca[:, None]
        rx = x[None, :] * ca[:, None] - y[None, :] * sa[:, None]
        iy = np.clip(np.round(ry).astype(np.int64) + HALF, 0, PATCH - 1)
        ix = np.clip(np.round(rx).astype(np.int64) + HALF, 0, PATCH - 1)
        return (iy * PATCH + ix).astype(np.int32)

    return rot_idx(pat[:, 0], pat[:, 1]), rot_idx(pat[:, 2], pat[:, 3])


def quantize_angle_bin(angles, n_bins: int = N_ANGLE_BINS):
    step = 2.0 * np.pi / n_bins
    return jnp.round(angles / step).astype(jnp.int32) % n_bins


BLUR_R = 3          # 7-tap Gaussian radius used before descriptor sampling
PATCH37 = PATCH + 2 * BLUR_R


@functools.lru_cache(maxsize=4)
def _blur_folded_tables(n_bins: int) -> np.ndarray:
    """(PATCH37^2, n_bins*256) f32: the descriptor sampling matrix with the
    7-tap Gaussian blur FOLDED IN.

    Both the blur and the pair sampling are linear maps of the raw (37, 37)
    window, so ``blur(patch)[q2] - blur(patch)[q1]`` equals one dot product of
    the raw window with a precomputed column (<= 98 nonzeros: 49 taps per
    sample point, +k for point 2, -k for point 1).  Removes the runtime blur
    (and its f32->bf16 reshape chain) from the extraction path entirely —
    bit-exact with blur-then-sample."""
    from fishbirdeyevisualslam_tpu.ops.image import _gauss_kernel

    i1, i2 = _binned_sample_tables(n_bins)   # (n_bins, 256) flat 31x31 indices
    k = _gauss_kernel(2 * BLUR_R + 1, 2.0).astype(np.float64)
    S = np.zeros((PATCH37 * PATCH37, n_bins * N_BITS), np.float64)
    cols = np.arange(n_bins * N_BITS)
    y1, x1 = np.divmod(i1.reshape(-1), PATCH)
    y2, x2 = np.divmod(i2.reshape(-1), PATCH)
    for a in range(2 * BLUR_R + 1):
        for b in range(2 * BLUR_R + 1):
            w = k[a] * k[b]
            np.add.at(S, ((y2 + a) * PATCH37 + (x2 + b), cols), w)
            np.add.at(S, ((y1 + a) * PATCH37 + (x1 + b), cols), -w)
    return S.astype(np.float32)


def descriptors_from_raw37_binned(patches37, angles,
                                  n_bins: int = N_ANGLE_BINS,
                                  cap: int | None = None,
                                  valid=None):
    """rBRIEF from raw (N, 37, 37) windows, GROUPED BY ANGLE BIN (r5 perf).

    ``descriptors_from_raw37`` computes the sampler matmul for ALL ``n_bins``
    rotations of every keypoint and one-hot-selects the right one — 16x the
    necessary FLOPs at 32 bins (0.5 ms/frame at 4096 keypoints on v5e, 46% of
    bf16 MXU peak: compute-bound, so the waste is real).  Here keypoints are
    grouped by their quantized bin with one sort, each bin's group (padded to
    ``cap`` rows) is contracted against ONLY its own (1369, 256) sampler
    slab as one batched matmul, and results are gathered back — identical
    bits, ~1/16 the FLOPs.  Falls back to the full sampler via ``lax.cond``
    when any bin overflows ``cap`` (default 3x the uniform share; angle
    distributions are near-uniform on natural images, but e.g. axis-aligned
    synthetic worlds can cluster).

    ``valid`` (N,) bool, if given, spreads INVALID slots' bins uniformly:
    padded keypoint slots all read the same dummy patch and so share one
    angle — without the spread a frame with > ``cap`` empty slots would
    permanently take the fallback.  Their descriptors are garbage either way
    and are zeroed by the caller."""
    n = patches37.shape[0]
    if cap is None:
        cap = max(128, -(-3 * n // n_bins))
    cap = min(cap, n)
    flat = patches37.reshape(n, -1).astype(jnp.bfloat16)
    K = flat.shape[1]
    S = _blur_folded_tables(n_bins)           # (K, n_bins*256) f32
    Sb = jnp.asarray(
        S.reshape(K, n_bins, N_BITS).transpose(1, 0, 2), jnp.bfloat16)
    bin_id = quantize_angle_bin(angles, n_bins)
    if valid is not None:
        bin_id = jnp.where(valid, bin_id,
                           jnp.arange(n, dtype=jnp.int32) % n_bins)
    iota = jnp.arange(n, dtype=jnp.int32)
    # group by bin: ONE sort of bin*n+idx gives contiguous per-bin runs
    sorted_key = jax.lax.sort(bin_id * n + iota)
    src = sorted_key % n                      # original keypoint per sorted pos
    sbin = sorted_key // n
    counts = jnp.sum((bin_id[None, :] == jnp.arange(n_bins)[:, None])
                     .astype(jnp.int32), axis=1)
    starts = jnp.cumsum(counts) - counts
    rank = iota - starts[sbin]                # position within the bin's run
    slot = sbin * cap + rank                  # padded (n_bins*cap) slot id
    # invert the sort permutation with a second small sort (not a gather of
    # scattered state): inv[i] = sorted position of original keypoint i
    inv = jax.lax.sort(src * n + iota) % n
    fits = jnp.max(counts) <= cap

    def binned(_):
        ncap = n_bins * cap
        slot_ok = rank < cap
        # slot -> source row map; overflow/empty slots read row 0 (their
        # descriptors are garbage and never gathered back)
        slot_src = jnp.zeros((ncap,), jnp.int32).at[
            jnp.where(slot_ok, slot, ncap)].set(src, mode="drop")
        g = flat[slot_src].reshape(n_bins, cap, K)
        D = jax.lax.dot_general(
            g, Sb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (n_bins, cap, 256)
        bits_all = (D > 0).reshape(ncap, N_BITS)
        slot_of = jnp.clip(slot[inv], 0, ncap - 1)    # keypoint -> its slot
        return bits_all[slot_of].astype(jnp.uint8)

    def full(_):
        return descriptors_from_raw37(patches37, angles, n_bins)

    return jax.lax.cond(fits, binned, full, None)


def descriptors_from_raw37(patches37, angles, n_bins: int = N_ANGLE_BINS):
    """rBRIEF directly from RAW (N, 37, 37) gather windows (blur folded into
    the sampling matrix — see ``_blur_folded_tables``).  TPU matmul path only;
    bit c of the keypoint's bin is sign(patch37 . S37[:, bin*256 + c])."""
    n = patches37.shape[0]
    flat = patches37.reshape(n, -1).astype(jnp.bfloat16)
    S = jnp.asarray(_blur_folded_tables(n_bins), jnp.bfloat16)
    D = jnp.dot(flat, S, preferred_element_type=jnp.float32)
    D = D.reshape(n, n_bins, N_BITS)
    bin_id = quantize_angle_bin(angles, n_bins)
    onehot = (bin_id[:, None] == jnp.arange(n_bins)[None, :]).astype(jnp.float32)
    d_sel = jnp.einsum("nb,nbc->nc", onehot, D)
    return (d_sel > 0).astype(jnp.uint8)


def descriptors(blurred_patches, angles, n_bins: int = N_ANGLE_BINS,
                use_matmul=None):
    """rBRIEF: rotate the pair pattern by the (bin-quantized) keypoint angle,
    nearest-sample the blurred patch, compare.  Returns bits (N, 256) uint8.

    Two equivalent samplers (parity-tested in tests/test_ops.py):

      * gather: per-keypoint ``take_along_axis`` with the bin's index table —
        fine on CPU, pathologically slow as an XLA TPU gather (measured
        ~11.7 ms/frame for 2048 keypoints — 70% of the tracking step).
      * matmul (TPU default): bit c of bin b is sign(v2 - v1) =
        sign(patch . s) where s is +1/-1 at the two sample positions — so ALL
        bins' bits come from ONE MXU matmul ``patches_flat @ S`` with
        S (961, n_bins*256), followed by a per-keypoint one-hot bin selection
        (einsum).  64 GFLOP of bf16 in place of a million-element gather.
    """
    if use_matmul is None:
        use_matmul = jax.default_backend() == "tpu"
    i1, i2 = _binned_sample_tables(n_bins)
    bin_id = quantize_angle_bin(angles, n_bins)
    n = blurred_patches.shape[0]
    flat = blurred_patches.reshape(n, -1)
    if use_matmul:
        cols = jnp.arange(n_bins * N_BITS)
        S = jnp.zeros((PATCH * PATCH, n_bins * N_BITS), jnp.bfloat16)
        S = S.at[jnp.asarray(i2).reshape(-1), cols].add(1.0)
        S = S.at[jnp.asarray(i1).reshape(-1), cols].add(-1.0)
        D = jnp.dot(flat.astype(jnp.bfloat16), S,
                    preferred_element_type=jnp.float32)
        D = D.reshape(n, n_bins, N_BITS)
        onehot = (bin_id[:, None] == jnp.arange(n_bins)[None, :]).astype(jnp.float32)
        d_sel = jnp.einsum("nb,nbc->nc", onehot, D)
        return (d_sel > 0).astype(jnp.uint8)
    idx1 = jnp.asarray(i1)[bin_id]  # (N, 256)
    idx2 = jnp.asarray(i2)[bin_id]
    v1 = jnp.take_along_axis(flat, idx1, axis=1)
    v2 = jnp.take_along_axis(flat, idx2, axis=1)
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
