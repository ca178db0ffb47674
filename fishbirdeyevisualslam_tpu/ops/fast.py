"""FAST-9/16 corner detection as whole-image vectorized ops (VPU-friendly).

The reference runs OpenCV ``cv::FAST`` per grid cell with a high/low threshold
fallback, then rebalances with a quadtree (``ORBextractor.cc:539,765``).  A scalar
per-pixel branchy detector is the wrong shape for a TPU; instead we compute, for
the full image at once:

  1. the 16 Bresenham-circle neighbor images via ``jnp.roll`` (free layout shifts),
  2. bright/dark bitmasks packed into one int32 lane per pixel,
  3. contiguous-arc(>=9) detection with log-shift AND folding on the doubled mask,
  4. a corner score (sum of circle |differences| beyond threshold — monotone in the
     classic FAST score, used only for ranking/NMS),
  5. 3x3 non-max suppression via reduce_window.

Grid uniformity (the quadtree's goal) is applied afterwards by per-cell top-k
selection in ``features.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 16-point Bresenham circle of radius 3, clockwise from 12 o'clock
# ((dy, dx) offsets; standard FAST definition).
CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)


def _circle_stack(img):
    """(16, H, W): neighbor intensity at each circle offset (roll = wrap; the 3px
    border is masked out by the caller)."""
    return jnp.stack(
        [jnp.roll(img, shift=(-dy, -dx), axis=(0, 1)) for dy, dx in CIRCLE], axis=0
    )


def _has_arc9(mask16):
    """mask16: (16, H, W) bool -> (H, W) bool: any cyclic run of >= 9 set bits.

    Packs the 16 booleans into an int32 bitfield per pixel, doubles it to handle
    wraparound, then folds with shifts: run9 = m & m>>1 & ... & m>>8 computed in
    log steps (4 ops instead of 8).
    """
    weights = jnp.asarray((1 << np.arange(16)).astype(np.int32))
    b = jnp.sum(mask16.astype(jnp.int32) * weights[:, None, None], axis=0)
    m = b | (b << 16)  # cyclic doubling
    r2 = m & (m >> 1)          # runs >= 2
    r4 = r2 & (r2 >> 2)        # runs >= 4
    r8 = r4 & (r4 >> 4)        # runs >= 8
    r9 = r8 & (m >> 8)         # runs >= 9
    return (r9 & 0xFFFF) != 0


def fast_score_maps(img, thresholds):
    """Score/corner maps for several thresholds from ONE circle-diff stack
    (the two-threshold detect shares the 16 rolled neighbor images)."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    circ = _circle_stack(img)
    d = circ - img[None]
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row >= 3) & (row < h - 3) & (col >= 3) & (col < w - 3)
    out = []
    for threshold in thresholds:
        bright = d > threshold
        dark = d < -threshold
        corner = (_has_arc9(bright) | _has_arc9(dark)) & interior
        score_b = jnp.sum(jnp.where(bright, d - threshold, 0.0), axis=0)
        score_d = jnp.sum(jnp.where(dark, -d - threshold, 0.0), axis=0)
        score = jnp.maximum(score_b, score_d)
        out.append((jnp.where(corner, score, 0.0), corner))
    return out


def fast_score_map(img, threshold: float):
    """Returns (score, is_corner) maps, both (H, W) float32/bool.

    Score = max(sum of (d - t) over bright circle pixels, sum of (-d - t) over dark
    ones) — the common sum-of-absolute-difference FAST ranking score.
    """
    return fast_score_maps(img, (threshold,))[0]


def nms3x3(score):
    """Keep only local maxima of a 3x3 neighborhood (OpenCV FAST nonmaxSuppression)."""
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((score >= mx) & (score > 0), score, 0.0)


def detect(img, ini_threshold: float, min_threshold: float, with_raw: bool = False):
    """Two-threshold FAST like the reference (iniThFAST=15, fall back to
    minThFAST=5 where the strict pass found nothing *in a neighborhood*;
    ``ORBextractor.cc:765`` does this per 30px cell).  Here: strict-pass corners
    keep a score bonus so per-cell top-k prefers them, and weak corners are kept
    only where no strict corner survived NMS in the same cell — approximated by
    adding a large constant to strict scores.

    Returns an NMS'd score map; 0 = not a corner.  With ``with_raw``, also
    returns the pre-NMS low-threshold score map (for subpixel peak
    interpolation — the NMS'd map has zeroed neighborhoods).
    """
    (s_hi, _), (s_lo, _) = fast_score_maps(img, (ini_threshold, min_threshold))
    # strict corners dominate ranking; weak-only corners fill sparse regions
    score = jnp.where(s_hi > 0, s_hi + 1e4, s_lo)
    out = nms3x3(score)
    if with_raw:
        return out, s_lo
    return out
