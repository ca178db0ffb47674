"""Batched descriptor matching — the TPU-native ORBmatcher.

The reference's matcher (``src/ORBmatcher.cc``) is a family of scalar loops:
grid-pruned candidate collection, XOR+popcount Hamming distance
(``DescriptorDistance``, ``:1951-1967``), best/second-best ratio tests, and a
rotation-consistency histogram (``ComputeThreeMaxima``, ``:1905-1946``).

Here every variant is one dense masked (N1, N2) problem:

  * Hamming distances for ALL pairs in one MXU matmul on +/-1 descriptors
    (see ``orb.bits_to_pm1``): D = (256 - A B^T) / 2.
  * candidate pruning (search windows, pyramid-level gates, ground-plane gates)
    becomes a boolean compatibility mask added as +inf,
  * best + second-best via top_k(2), ratio and absolute-distance tests as
    elementwise predicates,
  * the rotation histogram as a fixed-shape segment-sum + top-3 bin filter.

2000x2000 bf16 matmul = ~2 MFLOP-equivalent bitops — noise for the MXU; the
reference's grid pruning exists to make a CPU loop feasible and is unnecessary
as a *compute* optimization here (it remains as a mask for match *quality*).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.ops import orb as orb_ops

BIG = 1e9


class MatchResult(NamedTuple):
    idx: jnp.ndarray      # (N1,) int32 index into B, -1 if unmatched
    dist: jnp.ndarray     # (N1,) float32 Hamming distance (BIG if unmatched)
    ok: jnp.ndarray       # (N1,) bool

    @property
    def count(self):
        return jnp.sum(self.ok.astype(jnp.int32))


def window_mask(xy_a, xy_b, radius):
    """(N1, N2) bool: b within a square window around a.  ``radius`` may be scalar
    or (N1,) (per-query radii, e.g. scale-dependent like SearchByProjection)."""
    d = jnp.abs(xy_a[:, None, :] - xy_b[None, :, :])
    r = jnp.asarray(radius)
    r = r[:, None] if r.ndim == 1 else r
    return (d[..., 0] <= r) & (d[..., 1] <= r)


def level_mask(level_a, level_b, low=0, high=0):
    """b's octave within [a.octave + low, a.octave + high] (reference checks e.g.
    ``kp.octave >= nPredictedLevel-1`` in SearchByProjection)."""
    d = level_b[None, :] - level_a[:, None]
    return (d >= low) & (d <= high)


def match(
    pm1_a,
    pm1_b,
    compat,
    max_dist: float,
    ratio: Optional[float] = None,
    mutual: bool = False,
) -> MatchResult:
    """Best-match from each A-row into B under a compatibility mask.

    compat: (N1, N2) bool (invalid pairs excluded).  ratio: best < ratio * second
    (second-best over the same masked row).  mutual: require argmin symmetry.
    """
    D = orb_ops.hamming_matrix(pm1_a, pm1_b)
    D = jnp.where(compat, D, BIG)
    # top-2 via the packed-min trick (p = d*8192 + col is exact in f32 for
    # integer d <= 257 and col < 8192): two row-min reductions.  XLA lowers
    # top_k on TPU as a FULL SORT of each row — 0.88 ms/frame for a
    # (2048, 2048) problem in the round-3 device trace vs ~0.05 ms for the
    # min-reductions.  Falls back to top_k when N2 exceeds the packing range.
    N2 = D.shape[1]
    if N2 <= 8192:
        col = jnp.arange(N2, dtype=jnp.float32)
        p = jnp.where(compat, D * 8192.0 + col[None, :], BIG)
        p1 = jnp.min(p, axis=1)
        best = jnp.where(p1 >= BIG, BIG, jnp.floor(p1 / 8192.0))
        bidx_f = p1 - jnp.floor(p1 / 8192.0) * 8192.0
        bidx = jnp.where(p1 >= BIG, 0, bidx_f).astype(jnp.int32)
        p2 = jnp.min(jnp.where(col[None, :] == bidx_f[:, None], BIG, p), axis=1)
        second = jnp.where(p2 >= BIG, BIG, jnp.floor(p2 / 8192.0))
    else:
        neg2, idx2 = jax.lax.top_k(-D, 2)  # (N1, 2)
        best, second = -neg2[:, 0], -neg2[:, 1]
        bidx = idx2[:, 0]
    ok = best <= max_dist
    if ratio is not None:
        ok = ok & (best < ratio * second)
    if mutual:
        colbest = jnp.argmin(D, axis=0)  # (N2,)
        ok = ok & (colbest[bidx] == jnp.arange(D.shape[0]))
    return MatchResult(jnp.where(ok, bidx, -1), jnp.where(ok, best, BIG), ok)


def rotation_consistency(angle_a, angle_b, res: MatchResult, histo_length: int = 30,
                         keep_bins: int = 3, min_frac: float = 0.1) -> MatchResult:
    """Keep only matches whose keypoint-angle difference falls into the
    ``keep_bins`` most-populated of ``histo_length`` bins (bins 2..3 dropped if
    below ``min_frac`` of the max — ``ComputeThreeMaxima`` semantics)."""
    two_pi = 2.0 * jnp.pi
    rot = angle_a - jnp.where(res.ok, angle_b[res.idx], 0.0)
    rot = jnp.mod(rot, two_pi)
    bin_f = rot * (histo_length / two_pi)
    bins = jnp.round(bin_f).astype(jnp.int32) % histo_length
    counts = jnp.zeros((histo_length,), jnp.int32).at[bins].add(res.ok.astype(jnp.int32))
    top_c, top_i = jax.lax.top_k(counts, keep_bins)
    bin_ok = jnp.zeros((histo_length,), bool)
    for k in range(keep_bins):
        keep = (k == 0) | (top_c[k] > min_frac * top_c[0])
        bin_ok = bin_ok.at[top_i[k]].set(keep | bin_ok[top_i[k]])
    ok = res.ok & bin_ok[bins]
    return MatchResult(jnp.where(ok, res.idx, -1), jnp.where(ok, res.dist, BIG), ok)


def resolve_duplicates(res: MatchResult, n_b: int) -> MatchResult:
    """Enforce one-to-one: if several A rows matched the same B column, keep the
    closest (the reference overwrites previous matches when a better one arrives,
    e.g. SearchByProjection's rotation-duplicate handling)."""
    # min distance per target column
    per_col = jnp.full((n_b,), BIG).at[jnp.where(res.ok, res.idx, n_b - 1)].min(
        jnp.where(res.ok, res.dist, BIG)
    )
    is_best = res.ok & (res.dist <= per_col[jnp.clip(res.idx, 0, n_b - 1)])
    # tie-break equal distances by lowest row index
    rows = jnp.arange(res.idx.shape[0])
    first_row = jnp.full((n_b,), res.idx.shape[0]).at[
        jnp.where(is_best, res.idx, n_b - 1)
    ].min(jnp.where(is_best, rows, res.idx.shape[0]))
    ok = is_best & (first_row[jnp.clip(res.idx, 0, n_b - 1)] == rows)
    return MatchResult(jnp.where(ok, res.idx, -1), jnp.where(ok, res.dist, BIG), ok)
