"""Full ORB feature extraction pipeline: pyramid -> FAST -> grid-uniform top-k
selection -> orientation -> rBRIEF.  Fixed output shapes (padded with a validity
mask), jit-compatible end to end.

This is the TPU-native re-design of ``ORBextractor::operator()``
(``ORBextractor.cc:1043-1105``): the quadtree rebalancing
(``DistributeOctTree``, ``:539``) becomes per-cell top-k selection (same goal —
spatial uniformity under a global budget — as batched masked argmax instead of a
pointer tree), and the per-cell two-threshold FAST fallback becomes a score-bonus
scheme (see ``fast.detect``).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fishbirdeyevisualslam_tpu.config import OrbConfig
from fishbirdeyevisualslam_tpu.ops import fast as fast_ops
from fishbirdeyevisualslam_tpu.ops import image as image_ops
from fishbirdeyevisualslam_tpu.ops import orb as orb_ops


class Keypoints(NamedTuple):
    """Struct-of-arrays keypoint set, fixed capacity N (invalid slots masked)."""

    xy: jnp.ndarray        # (N, 2) float32, level-0 pixel coords (x, y)
    response: jnp.ndarray  # (N,) float32 FAST ranking score (0 for invalid)
    angle: jnp.ndarray     # (N,) float32 radians
    level: jnp.ndarray     # (N,) int32 pyramid octave
    valid: jnp.ndarray     # (N,) bool
    desc: jnp.ndarray      # (N, 8) uint32 packed rBRIEF
    desc_pm1: jnp.ndarray  # (N, 256) bfloat16 +/-1 (MXU matmul operand)

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]


def _select_grid_topk(score, n_out: int, cell: int, margin: int):
    """Spatially-uniform selection: per-cell top-k candidates, then global top-n.

    Returns (yx_idx (n_out, 2) int32, scores (n_out,) — 0 where no corner).
    """
    h, w = score.shape
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    ok = (row >= margin) & (row < h - margin) & (col >= margin) & (col < w - margin)
    score = jnp.where(ok, score, 0.0)

    ph = (cell - h % cell) % cell
    pw = (cell - w % cell) % cell
    s = jnp.pad(score, ((0, ph), (0, pw)))
    hh, ww = s.shape
    ncy, ncx = hh // cell, ww // cell
    cells = s.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3).reshape(ncy * ncx, cell * cell)
    k_cell = min(4, cell * cell)
    # top-k by iterated max+mask: k is tiny (4) while lax.top_k lowers to a
    # sort-backed TopK custom call that measured ~0.35 ms/frame across the
    # pyramid (profiler trace); 4 rounds of (max, argmax, mask) are pure VPU
    lane = jax.lax.broadcasted_iota(jnp.int32, cells.shape, 1)
    c = cells
    vs, ids = [], []
    for _ in range(k_cell):
        v = jnp.max(c, axis=1)
        i = jnp.argmax(c, axis=1).astype(jnp.int32)
        vs.append(v)
        ids.append(i)
        c = jnp.where(lane == i[:, None], -jnp.inf, c)
    vals = jnp.stack(vs, axis=1)   # (ncells, k) descending like top_k
    idx = jnp.stack(ids, axis=1)
    # reconstruct absolute coords
    cy = (jnp.arange(ncy * ncx, dtype=jnp.int32) // ncx)[:, None]
    cx = (jnp.arange(ncy * ncx, dtype=jnp.int32) % ncx)[:, None]
    iy = cy * cell + (idx // cell).astype(jnp.int32)
    ix = cx * cell + (idx % cell).astype(jnp.int32)
    flat_v = vals.reshape(-1)
    flat_y = iy.reshape(-1)
    flat_x = ix.reshape(-1)
    n_cand = flat_v.shape[0]
    if n_cand < n_out:
        pad = n_out - n_cand
        flat_v = jnp.pad(flat_v, (0, pad))
        flat_y = jnp.pad(flat_y, (0, pad))
        flat_x = jnp.pad(flat_x, (0, pad))
    top_v, top_i = jax.lax.top_k(flat_v, n_out)
    return (
        jnp.stack([flat_y[top_i], flat_x[top_i]], axis=-1),
        top_v,
    )


def _subpixel_offsets(score, yx):
    """Quadratic (parabola) interpolation of the NMS score peak in each axis —
    the TPU analog of cv::cornerSubPix refinement (``Frame.cc:349-352``); cuts
    the half-pixel detection quantization that otherwise dominates reprojection
    residuals under the strict chi2 gates."""
    h, w = score.shape
    y = jnp.clip(yx[:, 0], 1, h - 2)
    x = jnp.clip(yx[:, 1], 1, w - 2)
    c = score[y, x]
    dy0 = score[y - 1, x]
    dy1 = score[y + 1, x]
    dx0 = score[y, x - 1]
    dx1 = score[y, x + 1]

    def off(m, p, c):
        denom = m - 2.0 * c + p
        o = 0.5 * (m - p) / jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        return jnp.clip(o, -0.5, 0.5)

    return off(dy0, dy1, c), off(dx0, dx1, c)


_BLUR_R = 3  # Gaussian 7-tap radius for descriptor sampling


def _blur_patches(patches37):
    """(N, 37, 37) -> (N, 31, 31) separable 7-tap Gaussian, valid region only.

    Equivalent to cutting (31, 31) patches from a full-image GaussianBlur(7,7,2)
    (``ORBextractor.cc:1080-1100``) but ~100x cheaper: the blur runs on the
    N*37*37 gathered pixels instead of the whole pyramid, and the second patch
    gather (blurred set) disappears entirely."""
    k = jnp.asarray(image_ops._gauss_kernel(2 * _BLUR_R + 1, 2.0))
    x = sum(patches37[:, i : i + orb_ops.PATCH, :] * k[i]
            for i in range(2 * _BLUR_R + 1))
    return sum(x[:, :, i : i + orb_ops.PATCH] * k[i]
               for i in range(2 * _BLUR_R + 1))


def _detect_level(img_l, cfg: OrbConfig, n_l: int):
    """Per-level detection + selection: (yx, resp, valid, sub_dy, sub_dx)."""
    if jax.default_backend() == "tpu":
        # fused FAST+NMS kernel: image loaded into VMEM once, neighbor shifts
        # and the 3x3 NMS are VMEM rolls (parity vs the XLA path tested in
        # tests/test_pallas_fast.py)
        from fishbirdeyevisualslam_tpu.ops.pallas_fast import fast_detect
        score, raw = fast_detect(img_l, float(cfg.ini_th_fast),
                                 float(cfg.min_th_fast))
    else:
        score, raw = fast_ops.detect(img_l, float(cfg.ini_th_fast),
                                     float(cfg.min_th_fast), with_raw=True)
    margin = orb_ops.HALF + 1
    yx, resp = _select_grid_topk(score, n_l, cfg.grid_cell, margin)
    valid = resp > 0.0
    sub_dy, sub_dx = _subpixel_offsets(raw, yx)
    return yx, resp, valid, sub_dy, sub_dx


def _detect_patches(img, cfg: OrbConfig, n_features: int):
    """Detection + patch-gather phase of ``_extract_impl``: FAST + per-cell
    top-k on every pyramid level, then ONE (N, 37, 37) patch gather from the
    vertical level atlas.  Returns ``(patches37, partial_kp)`` where
    ``partial_kp`` is a Keypoints with desc/desc_pm1/angle left as None —
    ``_describe_patches`` fills them.  Split out so ``build_frame`` can run
    the descriptor matmul ONCE over the concatenated front+bird patch batch
    (two half-batch (2048, 1369)x(1369, 8192) sampler matmuls cost ~0.5
    ms/frame; the shared (4096, ...) one amortizes the fixed costs)."""
    budgets = image_ops.per_level_budget(n_features, cfg.n_levels, cfg.scale_factor)
    pyr = image_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    pad = orb_ops.HALF + _BLUR_R
    side = orb_ops.PATCH + 2 * _BLUR_R

    sels = [_detect_level(pyr[l], cfg, budgets[l]) for l in range(cfg.n_levels)]

    # --- vertical atlas of edge-padded level images (static layout)
    shapes = [(p.shape[0] + 2 * pad, p.shape[1] + 2 * pad) for p in pyr]
    atlas_w = max(w for _, w in shapes)
    offs = []
    off = 0
    for h, _ in shapes:
        offs.append(off)
        off += h
    atlas = jnp.zeros((off, atlas_w), img.dtype)
    for l in range(cfg.n_levels):
        img_p = jnp.pad(pyr[l], ((pad, pad), (pad, pad)), mode="edge")
        atlas = jax.lax.dynamic_update_slice(atlas, img_p, (offs[l], 0))

    yx_all = jnp.concatenate([
        sels[l][0] + jnp.asarray([offs[l], 0], jnp.int32)[None, :]
        for l in range(cfg.n_levels)], axis=0)

    if jax.default_backend() == "tpu":
        # VMEM-resident gather kernel (6.7x the vmap(dynamic_slice) lowering)
        from fishbirdeyevisualslam_tpu.ops.pallas_patch import extract_patches
        patches37 = extract_patches(atlas, yx_all, side)
    else:
        patches37 = jax.vmap(
            lambda p: jax.lax.dynamic_slice(atlas, (p[0], p[1]), (side, side))
        )(yx_all)

    xy0 = jnp.concatenate([
        jnp.stack([sels[l][0][:, 1].astype(jnp.float32) + sels[l][4],
                   sels[l][0][:, 0].astype(jnp.float32) + sels[l][3]], axis=-1)
        * (float(cfg.scale_factor) ** l)
        for l in range(cfg.n_levels)], axis=0)
    resp = jnp.concatenate([sels[l][1] for l in range(cfg.n_levels)])
    valid = jnp.concatenate([sels[l][2] for l in range(cfg.n_levels)])
    lvl = jnp.concatenate([
        jnp.full((budgets[l],), l, jnp.int32) for l in range(cfg.n_levels)])
    kp = Keypoints(xy0, jnp.where(valid, resp, 0.0), None, lvl, valid,
                   None, None)
    return patches37, kp


def _describe_patches(patches37, valid=None):
    """Orientation + rBRIEF over a (N, 37, 37) raw patch batch.
    Returns (ang, packed, pm1)."""
    patches = patches37[:, _BLUR_R: _BLUR_R + orb_ops.PATCH,
                        _BLUR_R: _BLUR_R + orb_ops.PATCH]
    ang = orb_ops.orientations(patches)
    if jax.default_backend() == "tpu":
        # blur folded into the sampling matmul; keypoints grouped by angle
        # bin so each group contracts only its own sampler slab (~1/16 the
        # FLOPs of the select-all-bins form — orb.descriptors_from_raw37_binned)
        bits = orb_ops.descriptors_from_raw37_binned(patches37, ang,
                                                     valid=valid)
    else:
        bits = orb_ops.descriptors(_blur_patches(patches37), ang)
    return ang, orb_ops.pack_bits(bits), orb_ops.bits_to_pm1(bits)


def _finish_keypoints(kp: Keypoints, ang, packed, pm1, img_shape,
                      detection_mask=None) -> Keypoints:
    """Attach descriptors to a ``_detect_patches`` partial result and apply
    the detection-mask gate."""
    valid = kp.valid
    # zero out invalid slots' descriptors so they never match anything real
    packed = jnp.where(valid[:, None], packed, 0)
    pm1 = jnp.where(valid[:, None], pm1, jnp.zeros_like(pm1))
    kp = kp._replace(angle=ang, desc=packed, desc_pm1=pm1)
    if detection_mask is not None:
        # gate keypoints whose level-0 coords fall outside the mask
        xi = jnp.clip(kp.xy[:, 0].astype(jnp.int32), 0, img_shape[1] - 1)
        yi = jnp.clip(kp.xy[:, 1].astype(jnp.int32), 0, img_shape[0] - 1)
        inside = detection_mask[yi, xi]
        kp = kp._replace(valid=kp.valid & inside,
                         response=jnp.where(inside, kp.response, 0.0))
    return kp


def _extract_impl(img, cfg: OrbConfig, n_features: int, detection_mask=None) -> Keypoints:
    """Extract exactly ``n_features`` (padded) ORB keypoints from a grayscale
    float32 (H, W) image.  ``detection_mask`` (H, W) bool, if given, suppresses
    detections outside it (the reference applies front masks and the bird-view
    freespace mask, ``mono_encoder.cc:144-158``, ``Frame.cc:337-339``).

    All pyramid levels share ONE patch gather and ONE descriptor pipeline: the
    padded level images are stacked vertically into a single atlas, keypoint
    rows are offset into it, and the (N_total, 37, 37) patch batch flows
    through blur/orientation/rBRIEF once — 2 patch-kernel launches per frame
    instead of 16, and the descriptor matmul runs at full batch (8 skinny
    per-level matmuls starved the MXU)."""
    patches37, kp = _detect_patches(img, cfg, n_features)
    ang, packed, pm1 = _describe_patches(patches37, kp.valid)
    return _finish_keypoints(kp, ang, packed, pm1, img.shape, detection_mask)


def extract_dual(img_a, img_b, cfg: OrbConfig, n_a: int, n_b: int,
                 mask_b=None):
    """Front+bird extraction with ONE shared descriptor pipeline: both views'
    (N, 37, 37) patch batches are concatenated so orientation and the rBRIEF
    sampler matmul run once at (n_a + n_b) batch — same results as two
    ``_extract_impl`` calls (the per-row math is independent), ~0.2 ms/frame
    cheaper at 2048+2048 (the (2048, 1369)x(1369, 8192) sampler ran twice).
    The patch GATHER stays per-image: each vertical level atlas must fit VMEM
    alone (~11 MB for the front view)."""
    pa, kpa = _detect_patches(img_a, cfg, n_a)
    pb, kpb = _detect_patches(img_b, cfg, n_b)
    ang, packed, pm1 = _describe_patches(
        jnp.concatenate([pa, pb], axis=0),
        jnp.concatenate([kpa.valid, kpb.valid], axis=0))
    na = pa.shape[0]
    kp_a = _finish_keypoints(kpa, ang[:na], packed[:na], pm1[:na],
                             img_a.shape, None)
    kp_b = _finish_keypoints(kpb, ang[na:], packed[na:], pm1[na:],
                             img_b.shape, mask_b)
    return kp_a, kp_b


# The public entry point is jitted (the 8-level eager graph is hundreds of tiny
# dispatches — a disaster off-compiler; one fixed-shape XLA program otherwise).
# cfg and n_features are static: one compilation per (image shape, config, budget).
extract = jax.jit(_extract_impl, static_argnums=(1, 2))
