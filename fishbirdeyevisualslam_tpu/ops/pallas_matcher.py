"""Pallas TPU kernel: tiled XOR+popcount Hamming distance matrix.

Two device strategies exist for ORB descriptor matching:

  1. ``orb.hamming_matrix`` — expand packed bits to +/-1 bfloat16 and use the
     MXU: D = (256 - A B^T) / 2.  Maximum throughput, but the expanded operands
     are 16x larger than the packed uint32 descriptors.
  2. this kernel — keep descriptors packed (N, 8) uint32 and compute
     popcount(a XOR b) on VPU tiles, streaming (TA, 8) x (TB, 8) blocks through
     VMEM.  Same result, 1/16th the operand bytes — the right choice when the
     map descriptor store is large and HBM bandwidth is the limit.

The kernel computes one (TILE_A, TILE_B) output block per grid step: the A-tile
and B-tile live in VMEM, the XOR+popcount runs per 32-bit word with an unrolled
8-word accumulation (VPU integer ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_A = 256
TILE_B = 512


def _hamming_kernel(a_ref, b_ref, out_ref):
    # a_ref: (TILE_A, 8) uint32; b_ref: (TILE_B, 8) uint32
    acc = jnp.zeros((a_ref.shape[0], b_ref.shape[0]), jnp.int32)
    for w in range(8):  # unrolled over the 8 packed words
        x = jax.lax.population_count(
            jnp.bitwise_xor(a_ref[:, w][:, None], b_ref[:, w][None, :])
        )
        acc = acc + x.astype(jnp.int32)
    out_ref[:, :] = acc.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_packed(desc_a, desc_b, interpret: bool = False):
    """(Na, 8) x (Nb, 8) packed uint32 -> (Na, Nb) float32 Hamming distances.

    Pads to tile multiples; padding rows produce garbage distances that callers
    mask out via their validity masks (invalid descriptors are all-zero, giving
    distance = popcount(b) — never a best match under masks).
    """
    na, nb = desc_a.shape[0], desc_b.shape[0]
    pa = -(-na // TILE_A) * TILE_A
    pb = -(-nb // TILE_B) * TILE_B
    a = jnp.zeros((pa, 8), jnp.uint32).at[:na].set(desc_a)
    b = jnp.zeros((pb, 8), jnp.uint32).at[:nb].set(desc_b)

    grid = (pa // TILE_A, pb // TILE_B)
    out = pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((pa, pb), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_A, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_A, TILE_B), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b)
    return out[:na, :nb]


# ---------------------------------------------------------------------------
# Fused masked match: distances + window gate + running top-2 without ever
# materializing the full distance matrix.
# ---------------------------------------------------------------------------

BIG = 1e9


def _fused_match_kernel(a_ref, ua_ref, b_ref, ub_ref, r_ref, out_ref):
    """Grid (i over A tiles, j over B tiles).  out block (TILE_A, 128):
    col 0 = best distance, col 1 = second-best, col 2 = best index (as f32).
    The out block for row-tile i is revisited across all j — running reduction
    in VMEM (standard Pallas accumulation pattern)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.full_like(out_ref, BIG)
        out_ref[:, 2] = jnp.full((out_ref.shape[0],), -1.0, out_ref.dtype)

    ta = a_ref.shape[0]
    tb = b_ref.shape[0]
    acc = jnp.zeros((ta, tb), jnp.int32)
    for w in range(8):
        acc = acc + jax.lax.population_count(
            jnp.bitwise_xor(a_ref[:, w][:, None], b_ref[:, w][None, :])
        ).astype(jnp.int32)
    d = acc.astype(jnp.float32)
    # search-window gate (|du|, |dv| <= r); invalid B rows carry uv = +inf
    r = r_ref[0]
    du = jnp.abs(ua_ref[:, 0][:, None] - ub_ref[:, 0][None, :])
    dv = jnp.abs(ua_ref[:, 1][:, None] - ub_ref[:, 1][None, :])
    d = jnp.where((du <= r) & (dv <= r), d, BIG)

    # tile-local best + second
    t1 = jnp.min(d, axis=1)
    ti = jnp.argmin(d, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (ta, tb), 1)
    d2m = jnp.where(col == ti[:, None], BIG, d)
    t2 = jnp.min(d2m, axis=1)
    t_idx = (ti + j * tb).astype(jnp.float32)

    # merge with running (b1, b2, bi)
    b1 = out_ref[:, 0]
    b2 = out_ref[:, 1]
    bi = out_ref[:, 2]
    new_b1 = jnp.minimum(b1, t1)
    take_new = t1 < b1
    new_bi = jnp.where(take_new, t_idx, bi)
    # second best = min of (the loser of b1 vs t1, b2, t2)
    loser = jnp.where(take_new, b1, t1)
    new_b2 = jnp.minimum(jnp.minimum(b2, t2), loser)
    out_ref[:, 0] = new_b1
    out_ref[:, 1] = new_b2
    out_ref[:, 2] = new_bi


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_masked_match(desc_a, uv_a, desc_b, uv_b, valid_b, radius,
                       interpret: bool = False):
    """Fused masked nearest-descriptor search.

    desc_a (Na, 8) uint32, uv_a (Na, 2); desc_b (Nb, 8), uv_b (Nb, 2),
    valid_b (Nb,) bool; radius: scalar window.  Returns (best_dist (Na,),
    second_dist (Na,), best_idx (Na,) int32).  The (Na, Nb) distance matrix is
    never materialized in HBM — this is the speed-of-light version of
    ``matcher.match`` for large maps.
    """
    na, nb = desc_a.shape[0], desc_b.shape[0]
    pa = -(-na // TILE_A) * TILE_A
    pb = -(-nb // TILE_B) * TILE_B
    a = jnp.zeros((pa, 8), jnp.uint32).at[:na].set(desc_a)
    b = jnp.zeros((pb, 8), jnp.uint32).at[:nb].set(desc_b)
    ua = jnp.full((pa, 2), -1e6, jnp.float32).at[:na].set(uv_a.astype(jnp.float32))
    ub = jnp.full((pb, 2), 1e6, jnp.float32).at[:nb].set(
        jnp.where(valid_b[:, None], uv_b.astype(jnp.float32), 1e6))
    r = jnp.asarray([radius], jnp.float32)

    grid = (pa // TILE_A, pb // TILE_B)
    out = pl.pallas_call(
        _fused_match_kernel,
        out_shape=jax.ShapeDtypeStruct((pa, 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_A, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_A, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, 2), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE_A, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, ua, b, ub, r)
    best = out[:na, 0]
    second = out[:na, 1]
    idx = out[:na, 2].astype(jnp.int32)
    idx = jnp.where(best < BIG, idx, -1)
    return best, second, idx


# ---------------------------------------------------------------------------
# MXU fused projection match: the tracking hot path (``SearchByProjection`` /
# ``BirdMapPointMatch`` gating) with the distance matrix never leaving VMEM.
#
# The op-graph path (``matcher.match``) computes D = (256 - A B^T)/2 on the MXU
# but writes the full (N_feat, N_points) f32 matrix to HBM (2048 x 16384 =
# 134 MB per frame) before the top-2 reduction reads it back.  This kernel runs
# the same MXU matmul tile-by-tile and merges a running (best, second, argmin)
# in VMEM, so HBM traffic is just the operands — the speed-of-light version for
# large maps.  Gates supported (matching ``slam.tracking.match_map_points``):
# per-target square search radius (scaled by predicted pyramid level), target
# validity (radius < 0 = invalid), and the |octave - predicted_level| <= 1
# window (``ORBmatcher.cc:46-157`` gating structure).
# ---------------------------------------------------------------------------


def _proj_match_kernel(a_pm1_ref, a_aux_ref, b_pm1_ref, b_aux_ref, out_ref,
                       *, level_window: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.full_like(out_ref, BIG)
        out_ref[:, 2] = jnp.full((out_ref.shape[0],), -1.0, out_ref.dtype)

    ta = a_pm1_ref.shape[0]
    tb = b_pm1_ref.shape[0]
    # MXU: Hamming = (256 - A B^T) / 2 on +/-1 bf16 descriptors (exact in f32).
    # precision pinned to DEFAULT: the package-wide "highest" matmul precision
    # would ask Mosaic for an fp32 contraction on bf16 vectors, which it rejects
    # (and bf16 is already exact here).
    dot = jax.lax.dot_general(
        a_pm1_ref[:, :], b_pm1_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    # gates: per-target window radius (negative = invalid target; invalid A
    # rows carry ua = -1e6 so the window test rejects them — no separate
    # A-validity lane op), optional octave-vs-predicted-level INTERVAL
    # [olo, ohi] precomputed on the B side (pred < 0 targets carry ±1e9).
    # aux operands arrive TRANSPOSED — (const, N) — so each gate scalar is a
    # contiguous LANE vector, not a strided column of an (N, 8) block
    ua = a_aux_ref[0, :][:, None]
    va = a_aux_ref[1, :][:, None]
    ub = b_aux_ref[0, :][None, :]
    vb = b_aux_ref[1, :][None, :]
    rb = b_aux_ref[2, :][None, :]
    ok = (jnp.abs(ua - ub) <= rb) & (jnp.abs(va - vb) <= rb)
    if level_window:
        oa = a_aux_ref[2, :][:, None]
        ok = ok & (oa >= b_aux_ref[4, :][None, :]) \
               & (oa <= b_aux_ref[5, :][None, :])

    # tile-local best + second via packed min: p = d * 2^13 + col is exact in
    # f32 (d integer <= 257*2^13 < 2^24), so ONE min reduction yields both the
    # best distance and its column — no argmin pass over the (ta, tb) tile.
    # d*8192 + col = 2^20 + col - 4096*dot, all integer-exact in f32: ONE fma
    # on the raw dot instead of the 0.5*(256-dot) rescale then repack.
    col = jax.lax.broadcasted_iota(jnp.int32, (ta, tb), 1).astype(jnp.float32)
    p = jnp.where(ok, (1048576.0 + col) - 4096.0 * dot, BIG)
    p1 = jnp.min(p, axis=1)
    t1 = jnp.where(p1 >= BIG, BIG, jnp.floor(p1 / 8192.0))
    ti = p1 - jnp.floor(p1 / 8192.0) * 8192.0
    p2 = jnp.min(jnp.where(col == ti[:, None], BIG, p), axis=1)
    t2 = jnp.where(p2 >= BIG, BIG, jnp.floor(p2 / 8192.0))
    t_idx = ti + (j * tb).astype(jnp.float32)

    b1 = out_ref[:, 0]
    b2 = out_ref[:, 1]
    bi = out_ref[:, 2]
    take_new = t1 < b1
    loser = jnp.where(take_new, b1, t1)
    out_ref[:, 0] = jnp.minimum(b1, t1)
    out_ref[:, 1] = jnp.minimum(jnp.minimum(b2, t2), loser)
    out_ref[:, 2] = jnp.where(take_new & (t1 < BIG), t_idx, bi)


def _proj_match_kernel_dual(a_pm1_ref, a_aux_ref, b_pm1_ref, b_aux_ref, out_ref,
                            *, level_window: bool, r2_scale: float):
    """Dual-radius variant of ``_proj_match_kernel``: ONE MXU distance pass,
    TWO gated top-1 reductions — radius r (cols 0,2) and r*r2_scale (cols 3,5).

    No second-best is computed: the motion-model search this serves applies no
    ratio test (``SearchByProjection(cur, last)``, ``ORBmatcher.cc:1329`` —
    threshold-only), so the extra masked min-reduction per tile per radius
    would be dead work in the hot kernel (round-2 advisor finding).

    Motivation: ``Tracking::TrackWithMotionModel`` retries with a doubled
    window when the first search finds <20 matches (``Tracking.cc:1358-1365``).
    The fused tracking core selects between both on-device; computing them in
    one kernel halves the dominant (N_feat x N_map) matmul work."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.full_like(out_ref, BIG)
        out_ref[:, 2] = jnp.full((out_ref.shape[0],), -1.0, out_ref.dtype)
        out_ref[:, 5] = jnp.full((out_ref.shape[0],), -1.0, out_ref.dtype)

    ta = a_pm1_ref.shape[0]
    tb = b_pm1_ref.shape[0]
    dot = jax.lax.dot_general(
        a_pm1_ref[:, :], b_pm1_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    # invalid A rows carry ua = -1e6 (window test rejects them); level gate is
    # a precomputed B-side interval; aux operands transposed (const, N) —
    # see _proj_match_kernel
    ua = a_aux_ref[0, :][:, None]
    va = a_aux_ref[1, :][:, None]
    ub = b_aux_ref[0, :][None, :]
    vb = b_aux_ref[1, :][None, :]
    rb = b_aux_ref[2, :][None, :]
    du = jnp.abs(ua - ub)
    dv = jnp.abs(va - vb)
    if level_window:
        oa = a_aux_ref[2, :][:, None]
        base_ok = (oa >= b_aux_ref[4, :][None, :]) \
            & (oa <= b_aux_ref[5, :][None, :])

    col = jax.lax.broadcasted_iota(jnp.int32, (ta, tb), 1).astype(jnp.float32)

    # VMEM liveness: build the WIDE-radius packed matrix once (fusing d away),
    # then derive the narrow one by masking it — the distance matrix is never
    # consumed by two reduction chains, which would force Mosaic to materialize
    # every elementwise temporary on the 16 MB kernel stack.
    r_wide = rb * r2_scale
    wide_ok = (du <= r_wide) & (dv <= r_wide)
    if level_window:
        wide_ok = wide_ok & base_ok
    p_wide = jnp.where(wide_ok, (1048576.0 + col) - 4096.0 * dot, BIG)
    p_narrow = jnp.where((du <= rb) & (dv <= rb), p_wide, BIG)

    for p, c0 in ((p_narrow, 0), (p_wide, 3)):
        p1 = jnp.min(p, axis=1)
        t1 = jnp.where(p1 >= BIG, BIG, jnp.floor(p1 / 8192.0))
        ti = p1 - jnp.floor(p1 / 8192.0) * 8192.0
        t_idx = ti + (j * tb).astype(jnp.float32)

        b1 = out_ref[:, c0 + 0]
        bi = out_ref[:, c0 + 2]
        take_new = t1 < b1
        out_ref[:, c0 + 0] = jnp.minimum(b1, t1)
        out_ref[:, c0 + 2] = jnp.where(take_new & (t1 < BIG), t_idx, bi)


# Tile sizes for the MXU projection matcher, swept on v5e at (2048 x 16384):
# (256,512) 0.98 ms, (512,1024) 0.58, (1024,1024) 0.51, (1024,2048) 0.49 ms
# (grid-step overhead amortizes with bigger tiles; (2048,2048) overflows VMEM —
# the f32 distance tile alone is 16 MB).
PROJ_TILE_A = 1024
PROJ_TILE_B = 2048


@functools.partial(jax.jit,
                   static_argnames=("level_window", "ratio", "interpret",
                                    "tile_a", "tile_b"))
def fused_projection_match(pm1_a, uv_a, oct_a, valid_a,
                           pm1_b, uv_b, radius_b, pred_b, valid_b,
                           max_dist, level_window: bool = False,
                           ratio=None, interpret: bool = False,
                           tile_a: int = PROJ_TILE_A, tile_b: int = PROJ_TILE_B):
    """Fused ``matcher.match`` for projection-gated problems.

    pm1_a (Na, 256) +/-1, uv_a (Na, 2), oct_a (Na,), valid_a (Na,) bool;
    pm1_b (Nb, 256), uv_b (Nb, 2) projected target positions, radius_b (Nb,)
    per-target window, pred_b (Nb,) predicted pyramid level, valid_b (Nb,).
    Returns ``matcher.MatchResult`` with exactly ``matcher.match`` semantics
    for compat = window(radius_b) & level_window & valid_a & valid_b.
    """
    from fishbirdeyevisualslam_tpu.ops.matcher import MatchResult

    na, nb = pm1_a.shape[0], pm1_b.shape[0]
    # clamp tiles for small problems (alignment: sublane 8, lane 128); the
    # packed (d * 8192 + col) tile reduction needs col < 8192
    tile_a = min(tile_a, -(-na // 8) * 8)
    tile_b = min(tile_b, -(-nb // 128) * 128)
    assert tile_b <= 8192, "packed top-2 reduction requires tile_b <= 8192"
    pa = -(-na // tile_a) * tile_a
    pb = -(-nb // tile_b) * tile_b
    bf = jnp.bfloat16
    # already-aligned bf16 operands (the persistent MapState pm1 stores, the
    # frame's own desc_pm1) pass through UNTOUCHED — a zeros+update-slice pad
    # here costs a full 8 MB HBM copy per match call (round-2 staging gap)
    a = pm1_a if (na == pa and pm1_a.dtype == bf) \
        else jnp.zeros((pa, 256), bf).at[:na].set(pm1_a.astype(bf))
    b = pm1_b if (nb == pb and pm1_b.dtype == bf) \
        else jnp.zeros((pb, 256), bf).at[:nb].set(pm1_b.astype(bf))
    # aux operands TRANSPOSED to (const, N): each gate scalar is one
    # contiguous lane-vector row (a column of an (N, 8) block is a strided
    # sublane read Mosaic pays dearly for).  Gate precompute (r4): invalid A
    # rows are poisoned with ua = -1e6 and the level window becomes a B-side
    # [olo, ohi] interval, so the kernel's per-element gate is pure
    # compare/and — no validity lane, no doct subtract, no pred<0 escape.
    a_aux = jnp.stack([
        jnp.where(valid_a, uv_a[:, 0].astype(jnp.float32), -1e6),
        uv_a[:, 1].astype(jnp.float32),
        oct_a.astype(jnp.float32),
        jnp.zeros((na,), jnp.float32),
    ])
    a_aux = jnp.pad(a_aux, ((0, 4), (0, pa - na)), constant_values=-1e6)
    r_eff = jnp.where(valid_b, jnp.broadcast_to(
        jnp.asarray(radius_b, jnp.float32), (nb,)), -1.0)
    predf = pred_b.astype(jnp.float32)
    no_oct = predf < 0.0
    b_aux = jnp.stack([
        uv_b[:, 0].astype(jnp.float32),
        uv_b[:, 1].astype(jnp.float32),
        r_eff,
        predf,
        jnp.where(no_oct, -1e9, predf - 1.0),
        jnp.where(no_oct, 1e9, predf + 1.0),
        jnp.zeros((nb,), jnp.float32),
        jnp.zeros((nb,), jnp.float32),
    ])
    b_aux = jnp.pad(b_aux, ((0, 0), (0, pb - nb)), constant_values=-1.0)

    grid = (pa // tile_a, pb // tile_b)
    out = pl.pallas_call(
        functools.partial(_proj_match_kernel, level_window=level_window),
        out_shape=jax.ShapeDtypeStruct((pa, 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_a, 256), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_a), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 256), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_b), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_a, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(a, a_aux, b, b_aux)
    best = out[:na, 0]
    second = out[:na, 1]
    idx = out[:na, 2].astype(jnp.int32)
    ok = best <= max_dist
    if ratio is not None:
        ok = ok & (best < ratio * second)
    return MatchResult(jnp.where(ok, idx, -1),
                       jnp.where(ok, best, BIG), ok)


@functools.partial(jax.jit,
                   static_argnames=("level_window", "r2_scale", "interpret",
                                    "tile_a", "tile_b"))
def fused_projection_match_dual(pm1_a, uv_a, oct_a, valid_a,
                                pm1_b, uv_b, radius_b, pred_b, valid_b,
                                max_dist, r2_scale: float = 2.0,
                                level_window: bool = False,
                                interpret: bool = False,
                                tile_a: int = 512,
                                tile_b: int = 1024):
    """Like ``fused_projection_match`` but evaluates TWO window radii —
    ``radius_b`` and ``radius_b * r2_scale`` (must be >= 1 — the narrow window
    is derived by masking the wide one) — from one distance pass.
    Returns ``(MatchResult_r1, MatchResult_r2)``.

    Default tiles are (512, 1024), smaller than the single-radius
    (1024, 2048): the dual reduction keeps two packed matrices plus |du|/|dv|
    live at once, and larger tiles overflow the 16 MB scoped-VMEM kernel
    stack (measured 22.3 MB at (1024,2048), 19.0 MB at (1024,1024))."""
    assert r2_scale >= 1.0, "narrow window must be contained in the wide one"
    from fishbirdeyevisualslam_tpu.ops.matcher import MatchResult

    na, nb = pm1_a.shape[0], pm1_b.shape[0]
    tile_a = min(tile_a, -(-na // 8) * 8)
    tile_b = min(tile_b, -(-nb // 128) * 128)
    assert tile_b <= 8192, "packed top-2 reduction requires tile_b <= 8192"
    pa = -(-na // tile_a) * tile_a
    pb = -(-nb // tile_b) * tile_b
    bf = jnp.bfloat16
    a = pm1_a if (na == pa and pm1_a.dtype == bf) \
        else jnp.zeros((pa, 256), bf).at[:na].set(pm1_a.astype(bf))
    b = pm1_b if (nb == pb and pm1_b.dtype == bf) \
        else jnp.zeros((pb, 256), bf).at[:nb].set(pm1_b.astype(bf))
    a_aux = jnp.stack([
        jnp.where(valid_a, uv_a[:, 0].astype(jnp.float32), -1e6),
        uv_a[:, 1].astype(jnp.float32),
        oct_a.astype(jnp.float32),
        jnp.zeros((na,), jnp.float32),
    ])
    a_aux = jnp.pad(a_aux, ((0, 4), (0, pa - na)), constant_values=-1e6)
    r_eff = jnp.where(valid_b, jnp.broadcast_to(
        jnp.asarray(radius_b, jnp.float32), (nb,)), -1.0)
    predf = pred_b.astype(jnp.float32)
    no_oct = predf < 0.0
    b_aux = jnp.stack([
        uv_b[:, 0].astype(jnp.float32),
        uv_b[:, 1].astype(jnp.float32),
        r_eff,
        predf,
        jnp.where(no_oct, -1e9, predf - 1.0),
        jnp.where(no_oct, 1e9, predf + 1.0),
        jnp.zeros((nb,), jnp.float32),
        jnp.zeros((nb,), jnp.float32),
    ])
    b_aux = jnp.pad(b_aux, ((0, 0), (0, pb - nb)), constant_values=-1.0)

    grid = (pa // tile_a, pb // tile_b)
    out = pl.pallas_call(
        functools.partial(_proj_match_kernel_dual, level_window=level_window,
                          r2_scale=r2_scale),
        out_shape=jax.ShapeDtypeStruct((pa, 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_a, 256), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_a), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 256), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_b), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_a, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(a, a_aux, b, b_aux)
    results = []
    for c0 in (0, 3):
        best = out[:na, c0]
        idx = out[:na, c0 + 2].astype(jnp.int32)
        ok = best <= max_dist
        results.append(MatchResult(jnp.where(ok, idx, -1),
                                   jnp.where(ok, best, BIG), ok))
    return tuple(results)
