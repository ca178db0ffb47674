"""IPM edge filtering — TPU-native ``EdgeFilterIPM`` (``src/edge_filter_ipm.cpp``).

The reference pipeline (``EdgeFilterIPM::process``, method 3 — the one
``simple_birdseye_odometer.cpp:80`` actually uses):

  1. 3x3 blur -> Otsu threshold -> Canny(otsu/2, otsu) on the birdseye image
     (``edge_filter_ipm.cpp:108-122``); Canny(50, 100) on the freespace image;
  2. freespace mask (>50) eroded 7x7, then the per-camera view mask
     (``:129-144``);
  3. IPM-artifact removal: radial streaks pointing at the per-camera IPM
     focal points are deleted (``remove_ipm_edge_by_contour_orientation``,
     ``:306-410`` — contour segments longer than half the min length whose
     orientation is within 15 deg of the focal ray);
  4. small-edge removal (<20-pixel contours, ``:411-431``);
  5. merged = 0.5 * birdseye_edges + 1.0 * freespace_edges (``:193-196``).

TPU-native redesign: everything is fixed-shape array ops —

  * Canny = Sobel -> 4-direction non-maximum suppression -> hysteresis as a
    fixed-iteration ``lax.scan`` of mask dilations (a data-dependent flood
    fill becomes a bounded label-propagation; 16 sweeps cover any weak chain
    up to 16 px from a strong seed, which is the scale that matters at 384^2);
  * Otsu = 256-bin histogram + argmax of the between-class variance;
  * contour orientation -> PER-PIXEL tangent: the local edge tangent is
    perpendicular to the Sobel gradient, so a "contour segment aimed at the
    focal point" is a pixel whose tangent is within the angle threshold of
    its focal ray; the reference's min-segment-length gate becomes a
    connected-component-size gate over the aligned-pixel mask;
  * connected-component size = iterative min-label propagation (fixed sweep
    count) + bincount — components merge up to the geodesic sweep radius,
    which upper-bounds the exact contour length the reference measures
    (documented deviation: very long snaking components can fragment).

Per-view focal points / intensities default to the reference rig's constants
(``edge_filter_ipm.cpp:7-11`` — data constants of the same 384x384 surround
stitch, category-(b) must-match values).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# view order: front, rear, left, right (edge_filter_ipm.cpp:5-11)
VIEW_INTENSITIES = (50, 100, 150, 200)
FOCAL_POINT_X = (189, 187, 164, 217)
FOCAL_POINT_Y = (128, 248, 178, 176)


def box_blur3(img):
    """3x3 box blur (``blur(birdseye_img_, Size(3,3))``)."""
    k = jnp.ones((3, 3), img.dtype) / 9.0
    return jax.lax.conv_general_dilated(
        img[None, None], k[None, None], (1, 1), "SAME")[0, 0]


def otsu_threshold(img):
    """Otsu's threshold over a 256-bin histogram (maximize between-class
    variance) — ``threshold(..., CV_THRESH_OTSU)``."""
    v = jnp.clip(img, 0.0, 255.0)
    hist = jnp.zeros((256,)).at[v.astype(jnp.int32).reshape(-1)].add(1.0)
    p = hist / jnp.maximum(hist.sum(), 1.0)
    w0 = jnp.cumsum(p)                       # class-0 weight for t = 0..255
    mu = jnp.cumsum(p * jnp.arange(256))
    mu_t = mu[-1]
    w1 = 1.0 - w0
    between = jnp.where(
        (w0 > 0) & (w1 > 0), (mu_t * w0 - mu) ** 2 / (w0 * w1 + 1e-12), 0.0)
    return jnp.argmax(between).astype(jnp.float32)


def _shift(x, dy: int, dx: int, fill):
    """Neighbor shift with constant fill — NOT ``jnp.roll``: a wrap-around
    shift treats opposite image borders as 8-connected neighbors, so strong
    Canny edges propagate through weak chains across the border, erosion
    wraps, and components merge across borders (ADVICE r4); OpenCV's border
    handling never does this."""
    H, W = x.shape
    p = jnp.pad(x, ((1, 1), (1, 1)), constant_values=fill)
    # same index convention as jnp.roll: result[i, j] = x[i - dy, j - dx]
    return jax.lax.dynamic_slice(p, (1 - dy, 1 - dx), (H, W))


def _sobel(img):
    gx = (img[1:-1, 2:] - img[1:-1, :-2]) * 2.0 \
        + (img[:-2, 2:] - img[:-2, :-2]) + (img[2:, 2:] - img[2:, :-2])
    gy = (img[2:, 1:-1] - img[:-2, 1:-1]) * 2.0 \
        + (img[2:, :-2] - img[:-2, :-2]) + (img[2:, 2:] - img[:-2, 2:])
    return jnp.pad(gx, 1), jnp.pad(gy, 1)


def canny(img, lo, hi, hysteresis_iters: int = 16):
    """Canny edges: Sobel -> 4-direction NMS -> double threshold -> bounded
    hysteresis (fixed-iteration dilation of the strong set through the weak
    set)."""
    gx, gy = _sobel(img)
    mag = jnp.hypot(gx, gy)
    # quantize gradient direction to 0/45/90/135 and compare the two
    # neighbors along it
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    a = jnp.mod(ang * (180.0 / jnp.pi) + 180.0, 180.0)
    d0 = (a < 22.5) | (a >= 157.5)          # horizontal gradient -> E/W nbrs
    d1 = (a >= 22.5) & (a < 67.5)           # diag
    d2 = (a >= 67.5) & (a < 112.5)          # vertical
    d3 = (a >= 112.5) & (a < 157.5)         # anti-diag

    def sh(dy, dx):
        return _shift(mag, dy, dx, 0.0)

    n1 = jnp.where(d0, sh(0, 1), jnp.where(d1, sh(1, 1),
                   jnp.where(d2, sh(1, 0), sh(1, -1))))
    n2 = jnp.where(d0, sh(0, -1), jnp.where(d1, sh(-1, -1),
                   jnp.where(d2, sh(-1, 0), sh(-1, 1))))
    is_max = (mag >= n1) & (mag >= n2)
    strong = is_max & (mag >= hi)
    weak = is_max & (mag >= lo)

    def body(s, _):
        grown = s
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    grown = grown | _shift(s, dy, dx, False)
        return grown & weak | s, None

    strong, _ = jax.lax.scan(body, strong, None, length=hysteresis_iters)
    return strong, gx, gy


def erode(mask, radius: int):
    """Rectangular erosion (``getStructuringElement(MORPH_RECT, ...)``)."""
    out = mask
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy or dx:
                out = out & _shift(mask, dy, dx, False)
    return out


def component_sizes(mask, n_sweeps: int = 48):
    """Approximate connected-component sizes (8-connectivity) by min-label
    propagation: each pixel starts with its flat index; ``n_sweeps`` 3x3 min
    sweeps spread the minimum; bincount of final labels gives sizes.
    Components whose geodesic diameter exceeds ``n_sweeps`` fragment into
    pieces of at least that diameter — an UNDER-estimate never below
    ~n_sweeps pixels, so thresholds << n_sweeps are exact."""
    H, W = mask.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    big = jnp.int32(H * W)
    lab = jnp.where(mask, idx, big)

    def body(lb, _):
        m = lb
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    m = jnp.minimum(m, _shift(lb, dy, dx, big))
        return jnp.where(mask, m, big), None

    lab, _ = jax.lax.scan(body, lab, None, length=n_sweeps)
    sizes = jnp.zeros((H * W + 1,), jnp.int32).at[lab.reshape(-1)].add(
        mask.reshape(-1).astype(jnp.int32))
    return sizes[lab]


def default_view_index(shape):
    """Per-pixel view index when no stitch mask is given: the 4-quadrant
    diagonal split of a surround view (front/rear/left/right wedges)."""
    H, W = shape
    r = jnp.arange(H)[:, None] - H / 2.0
    c = jnp.arange(W)[None, :] - W / 2.0
    front = (r <= -jnp.abs(c) * (H / W))
    rear = (r >= jnp.abs(c) * (H / W))
    left = (~front) & (~rear) & (c < 0)
    return jnp.where(front, 0, jnp.where(rear, 1, jnp.where(left, 2, 3)))


def view_index_from_mask(view_mask):
    """Per-pixel view index from the dataset's intensity-coded stitch mask."""
    vi = jnp.full(view_mask.shape, 0, jnp.int32)
    for i, inten in enumerate(VIEW_INTENSITIES):
        vi = jnp.where(jnp.abs(view_mask - inten) < 10, i, vi)
    return vi


@functools.partial(jax.jit, static_argnames=("angle_thresh_deg", "min_len"))
def remove_radial_artifacts(edge, gx, gy, angle_thresh_deg: float,
                            view_idx=None, focal_xy=None, min_len: int = 20):
    """``remove_ipm_edge_by_contour_orientation`` analog: delete edge pixels
    whose LOCAL TANGENT (perpendicular to the gradient) points at the view's
    IPM focal point within ``angle_thresh_deg``, when they belong to an
    aligned structure at least ``min_len/2`` pixels long (the reference's
    ``2*|seg| > 0.5*min_len`` gate on approxPolyDP segments)."""
    H, W = edge.shape
    if view_idx is None:
        view_idx = default_view_index((H, W))
    if focal_xy is None:
        focal_xy = jnp.stack([jnp.asarray(FOCAL_POINT_X, jnp.float32),
                              jnp.asarray(FOCAL_POINT_Y, jnp.float32)], -1)
    fx = focal_xy[view_idx, 0]
    fy = focal_xy[view_idx, 1]
    rr = jnp.arange(H, dtype=jnp.float32)[:, None]
    cc = jnp.arange(W, dtype=jnp.float32)[None, :]
    ray = jnp.arctan2(fy - rr, fx - cc)
    tangent = jnp.arctan2(gx, -gy)  # perpendicular to the gradient
    dang = jnp.abs(jnp.mod(tangent - ray + jnp.pi / 2, jnp.pi) - jnp.pi / 2)
    aligned = edge & (dang < jnp.deg2rad(angle_thresh_deg))
    long_enough = component_sizes(aligned) >= max(1, min_len // 2)
    return edge & ~(aligned & long_enough)


@functools.partial(jax.jit, static_argnames=("min_size",))
def remove_small_edges(edge, min_size: int = 20):
    """``remove_small_edges``: drop components shorter than ``min_size``."""
    return edge & (component_sizes(edge) >= min_size)


@jax.jit
def filter_ipm_edges(bird_img, freespace_img, view_mask=None):
    """Full ``EdgeFilterIPM::process(method=3)``: returns (merged (H, W) f32
    edge weights, bird_edges bool, free_edges bool).

    ``merged = 0.5 * bird + 1.0 * freespace`` like the reference's
    ``addWeighted`` (``edge_filter_ipm.cpp:193-196``)."""
    blur = box_blur3(bird_img)
    otsu = otsu_threshold(blur)
    # OpenCV's Canny compares the UNNORMALIZED Sobel magnitude against the
    # thresholds directly — same convention here (otsu/2, otsu) and (50, 100)
    bird_edge, gx, gy = canny(blur, 0.5 * otsu, otsu)
    free_edge, fgx, fgy = canny(freespace_img, 50.0, 100.0)

    fmask = erode(freespace_img > 50.0, 3)
    vi = None if view_mask is None else view_index_from_mask(view_mask)
    bird_edge = bird_edge & fmask
    free_edge = free_edge & fmask
    bird_edge = remove_radial_artifacts(bird_edge, gx, gy, 15.0, vi,
                                        min_len=20)
    free_edge = remove_radial_artifacts(free_edge, fgx, fgy, 15.0, vi,
                                        min_len=20)
    bird_edge = remove_small_edges(bird_edge, 20)
    merged = 0.5 * bird_edge.astype(jnp.float32) \
        + 1.0 * free_edge.astype(jnp.float32)
    return merged, bird_edge, free_edge
