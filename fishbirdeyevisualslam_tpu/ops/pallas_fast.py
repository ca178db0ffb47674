"""Pallas TPU kernel: fused two-threshold FAST-9/16 + 3x3 NMS per pyramid level.

The XLA formulation (``ops/fast.py``) builds 16 rolled neighbor images, two
threshold masks, arc-fold bitmasks, two score maps and a reduce-window NMS —
a chain of whole-image intermediates that XLA only partially fuses (~0.4 ms
of the tracking step across the pyramid).  Here the level image is loaded
into VMEM ONCE and every neighbor shift is a VMEM-resident ``pltpu.roll``;
HBM traffic is one image read + two map writes (NMS'd ranking score and the
raw low-threshold score for subpixel interpolation).

Semantics match ``fast_ops.detect(img, th_hi, th_lo, with_raw=True)`` exactly
(parity-tested in tests/test_pallas_fast.py): strict-pass corners get the
+1e4 ranking bonus, weak corners fill elsewhere, NMS keeps 3x3 maxima.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fishbirdeyevisualslam_tpu.ops.fast import CIRCLE

_BONUS = 1e4


def _arc9(b):
    """int32 bitfield (16 circle bits) -> bool: any cyclic run >= 9."""
    m = b | (b << 16)
    r2 = m & (m >> 1)
    r4 = r2 & (r2 >> 2)
    r8 = r4 & (r4 >> 4)
    r9 = r8 & (m >> 8)
    return (r9 & 0xFFFF) != 0


def _fast_kernel(img_ref, score_ref, raw_ref, *, th_hi: float, th_lo: float,
                 real_h: int, real_w: int):
    img = img_ref[:, :]
    h, w = img.shape

    b_hi = jnp.zeros(img.shape, jnp.int32)
    b_lo = jnp.zeros(img.shape, jnp.int32)
    d_hi = jnp.zeros(img.shape, jnp.float32)  # bright score accum (hi)
    k_hi = jnp.zeros(img.shape, jnp.float32)  # dark score accum (hi)
    d_lo = jnp.zeros(img.shape, jnp.float32)
    k_lo = jnp.zeros(img.shape, jnp.float32)
    bd_hi = jnp.zeros(img.shape, jnp.int32)   # dark bitmask (hi)
    bd_lo = jnp.zeros(img.shape, jnp.int32)

    for i, (dy, dx) in enumerate(CIRCLE):
        # neighbor value at (y+dy, x+dx): roll left/up by (dy, dx)
        n = pltpu.roll(pltpu.roll(img, (-int(dy)) % h, 0), (-int(dx)) % w, 1)
        d = n - img
        bit = jnp.int32(1 << i)
        bright_hi = d > th_hi
        dark_hi = d < -th_hi
        bright_lo = d > th_lo
        dark_lo = d < -th_lo
        b_hi = b_hi | jnp.where(bright_hi, bit, 0)
        bd_hi = bd_hi | jnp.where(dark_hi, bit, 0)
        b_lo = b_lo | jnp.where(bright_lo, bit, 0)
        bd_lo = bd_lo | jnp.where(dark_lo, bit, 0)
        d_hi = d_hi + jnp.where(bright_hi, d - th_hi, 0.0)
        k_hi = k_hi + jnp.where(dark_hi, -d - th_hi, 0.0)
        d_lo = d_lo + jnp.where(bright_lo, d - th_lo, 0.0)
        k_lo = k_lo + jnp.where(dark_lo, -d - th_lo, 0.0)

    # interior of the REAL image (masked BEFORE NMS so padded-region pseudo
    # scores can never suppress true boundary corners)
    row = jax.lax.broadcasted_iota(jnp.int32, img.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, img.shape, 1)
    interior = (row >= 3) & (row < real_h - 3) & (col >= 3) & (col < real_w - 3)

    corner_hi = (_arc9(b_hi) | _arc9(bd_hi)) & interior
    corner_lo = (_arc9(b_lo) | _arc9(bd_lo)) & interior
    s_hi = jnp.where(corner_hi, jnp.maximum(d_hi, k_hi), 0.0)
    s_lo = jnp.where(corner_lo, jnp.maximum(d_lo, k_lo), 0.0)
    score = jnp.where(s_hi > 0, s_hi + _BONUS, s_lo)

    # 3x3 NMS via rolls (wrapping is irrelevant: borders are zeroed by the
    # interior mask and real corners sit >= 3 px inside)
    mx = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mx = jnp.maximum(
                mx, pltpu.roll(pltpu.roll(score, (-dy) % h, 0), (-dx) % w, 1))
    score_ref[:, :] = jnp.where((score >= mx) & (score > 0), score, 0.0)
    raw_ref[:, :] = s_lo


def _fast_detect_whole(img, th_hi: float, th_lo: float, interpret: bool):
    h, w = img.shape
    ph = -(-h // 8) * 8
    pw = -(-w // 128) * 128
    img_p = jnp.pad(img.astype(jnp.float32), ((0, ph - h), (0, pw - w)))
    score, raw = pl.pallas_call(
        functools.partial(_fast_kernel, th_hi=float(th_hi), th_lo=float(th_lo),
                          real_h=h, real_w=w),
        out_shape=(jax.ShapeDtypeStruct((ph, pw), jnp.float32),
                   jax.ShapeDtypeStruct((ph, pw), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(img_p)
    return score[:h, :w], raw[:h, :w]


# The kernel holds ~10 full-image f32/i32 temporaries live (two-threshold
# bitmasks + score accumulators + NMS), ~70 B/pixel of scoped VMEM.  Cap the
# per-launch pixel count so the largest pyramid levels split into row bands;
# an 8-row halo (3 circle + 3 boundary mask + 1 NMS + margin) makes banding
# EXACT: each band's kept interior sees identical neighborhoods.
_MAX_ELEMS = 160 * 1024
_HALO = 8


@functools.partial(jax.jit, static_argnames=("th_hi", "th_lo", "interpret"))
def fast_detect(img, th_hi: float, th_lo: float, interpret: bool = False):
    """Drop-in for ``fast_ops.detect(img, th_hi, th_lo, with_raw=True)`` on TPU.

    Returns (nms_score, raw_low_score), both (H, W) f32.
    """
    h, w = img.shape
    pw = -(-w // 128) * 128
    if h * pw <= _MAX_ELEMS:
        return _fast_detect_whole(img, th_hi, th_lo, interpret)
    n_bands = -(-(h * pw) // _MAX_ELEMS)
    band_h = -(-h // n_bands)
    scores, raws = [], []
    for b in range(n_bands):
        k0 = b * band_h                      # first kept row
        k1 = min(h, (b + 1) * band_h)        # one past last kept row
        y0 = max(0, k0 - _HALO)
        y1 = min(h, k1 + _HALO)
        s, r = _fast_detect_whole(img[y0:y1], th_hi, th_lo, interpret)
        # boundary-mask correctness: at true image edges the band edge IS the
        # image edge (mask correct); at interior band edges the kept region is
        # >= _HALO > 3+1 rows away from the band boundary
        scores.append(s[k0 - y0: k1 - y0])
        raws.append(r[k0 - y0: k1 - y0])
    return jnp.concatenate(scores, axis=0), jnp.concatenate(raws, axis=0)
