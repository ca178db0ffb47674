"""Pallas TPU kernel: batched patch extraction around keypoints.

``jax.vmap(lax.dynamic_slice)`` — the XLA formulation of "cut a (37, 37)
window around each keypoint" — lowers to a per-keypoint gather chain that
measures 1.7 ms/frame for ~2000 keypoints on v5e (60% of post-FAST extraction
time).  Here the level image sits in VMEM once and a fori loop issues one
dynamic VMEM read + write per keypoint: the image is read at register speed
and HBM traffic is just image + patches.

Reference context: the patches feed IC_Angle orientation and rBRIEF sampling
(``ORBextractor.cc:77,108``); see ops/features.py for the pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128


_WIN_R = 48    # aligned window rows (>= side + 8, multiple of 8)
_WIN_C = 256   # aligned window lanes (>= side + 128, multiple of 128)


def _patch_kernel(yx_ref, img_ref, out_ref, *, side: int, tile: int):
    # Mosaic vector loads need statically aligned starts (sublane: 8, lane:
    # 128).  Load the aligned (48, 256) window containing the patch, then
    # shift the 0..7 / 0..127 residuals into place with hardware rotates.

    def body(k, carry):
        y = yx_ref[k, 0]
        x = yx_ref[k, 1]
        y8 = pl.multiple_of((y // 8) * 8, 8)
        x128 = pl.multiple_of((x // 128) * 128, 128)
        win = img_ref[pl.ds(y8, _WIN_R), pl.ds(x128, _WIN_C)]
        win = pltpu.roll(win, _WIN_R - (y - y8), 0)
        win = pltpu.roll(win, _WIN_C - (x - x128), 1)
        out_ref[pl.ds(k, 1)] = win[:side, :side][None]
        return carry

    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnames=("side", "interpret"))
def extract_patches(img_padded, yx, side: int, interpret: bool = False):
    """(Hp, Wp) f32 image, (N, 2) int32 top-left corners -> (N, side, side).

    Starts must satisfy 0 <= y <= Hp - side (guaranteed by the detection
    margin in features._select_grid_topk).  Drop-in replacement for
    ``vmap(lambda p: lax.dynamic_slice(img, (p[0], p[1]), (side, side)))(yx)``.
    """
    n = yx.shape[0]
    np_ = -(-n // TILE_N) * TILE_N
    # padded (invalid) slots read at (0, 0) — harmless, masked downstream
    yx_p = jnp.zeros((np_, 2), jnp.int32).at[:n].set(yx.astype(jnp.int32))
    # aligned window loads overrun the patch by up to (rows-side, cols-side)
    img_padded = jnp.pad(img_padded, ((0, _WIN_R - side + 8),
                                      (0, _WIN_C - side + 128)))

    out = pl.pallas_call(
        functools.partial(_patch_kernel, side=side, tile=TILE_N),
        grid=(np_ // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(img_padded.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, side, side), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, side, side), jnp.float32),
        interpret=interpret,
    )(yx_p, img_padded.astype(jnp.float32))
    return out[:n]
