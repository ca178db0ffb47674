"""Offline visualization — the metric-path-free analog of the reference's
Pangolin/OpenCV/PCL viewers (``Viewer.cc``, ``MapDrawer.cc``, ``FrameDrawer.cc``,
SURVEY.md §2 visualization row).

The reference renders live GL windows; on a headless TPU host the equivalent is
figure export: map points, keyframe trajectory + covisibility edges, and the
estimate-vs-odometry-vs-GT comparison the reference draws with its two PCL
viewers (``Tracking.cc:2569-2624``).
"""

from __future__ import annotations

import numpy as np

# overlay colors (RGB)
_GREEN = np.array([40, 220, 60], np.uint8)    # tracked map point
_BLUE = np.array([80, 140, 255], np.uint8)    # detected, unmatched
_ORANGE = np.array([255, 160, 40], np.uint8)  # bird match
_RED = np.array([230, 60, 60], np.uint8)      # contour edge recolor


def _gray_to_rgb(gray) -> np.ndarray:
    g = np.asarray(gray, np.float32)
    g = np.clip(g, 0, 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def _draw_squares(rgb: np.ndarray, uv: np.ndarray, color: np.ndarray,
                  half: int = 3) -> None:
    """Rasterize hollow squares around keypoints in-place (the reference draws
    ``cv::rectangle`` + ``cv::circle`` per keypoint, ``FrameDrawer.cc:83-116``)."""
    h, w = rgb.shape[:2]
    for u, v in uv:
        x, y = int(round(u)), int(round(v))
        x0, x1 = max(x - half, 0), min(x + half, w - 1)
        y0, y1 = max(y - half, 0), min(y + half, h - 1)
        if x1 <= x0 or y1 <= y0:
            continue
        rgb[y0, x0:x1 + 1] = color
        rgb[y1, x0:x1 + 1] = color
        rgb[y0:y1 + 1, x0] = color
        rgb[y0:y1 + 1, x1] = color


def draw_frame_overlay(front_gray, uv, matched_mask, valid_mask,
                       state: int = 1, n_tracked: int | None = None) -> np.ndarray:
    """``FrameDrawer::DrawFrame`` analog (``FrameDrawer.cc:40-128``): the front
    image with green squares on features matched to map points and blue on
    unmatched detections, plus a status strip.  Returns an (H+20, W, 3) uint8
    RGB image; pure host-side numpy, out of the metric path."""
    rgb = _gray_to_rgb(front_gray)
    uv = np.asarray(uv)
    matched = np.asarray(matched_mask, bool)
    valid = np.asarray(valid_mask, bool)
    _draw_squares(rgb, uv[valid & ~matched], _BLUE, half=2)
    _draw_squares(rgb, uv[valid & matched], _GREEN, half=3)
    # status strip: state + counter rendered as a simple intensity bar
    # (the reference rasterizes text with cv::putText; a headless export keeps
    # the counts in the filename/log and encodes state as strip color)
    strip = np.zeros((20, rgb.shape[1], 3), np.uint8)
    strip[:] = {0: (90, 90, 90), 1: (30, 120, 30), 2: (140, 40, 40)}.get(
        int(state), (90, 90, 90))
    n = int(matched[valid].sum()) if n_tracked is None else int(n_tracked)
    px = min(max(n * 2, 0), rgb.shape[1])
    strip[6:14, :px] = (230, 230, 230)
    return np.concatenate([rgb, strip], axis=0)


def draw_bird_overlay(bird_gray, bird_uv, matched_mask, valid_mask,
                      contour=None) -> np.ndarray:
    """``FrameDrawer::DrawBird``/``DrawBirdMatches`` analog
    (``FrameDrawer.cc:130-224``): bird view with contour edges recolored red
    and matched bird keypoints in orange, detections in blue."""
    rgb = _gray_to_rgb(bird_gray)
    if contour is not None:
        edge = np.asarray(contour) < 150
        rgb[edge] = (rgb[edge] // 2) + _RED // 2
    uv = np.asarray(bird_uv)
    matched = np.asarray(matched_mask, bool)
    valid = np.asarray(valid_mask, bool)
    _draw_squares(rgb, uv[valid & ~matched], _BLUE, half=2)
    _draw_squares(rgb, uv[valid & matched], _ORANGE, half=3)
    return rgb


class FrameDrawer:
    """Per-frame overlay exporter — the reference ``FrameDrawer`` snapshots the
    Tracking state each frame (``FrameDrawer::Update``, ``FrameDrawer.cc:264``)
    and the Viewer renders it; here ``update()`` snapshots ``SlamSystem`` and
    ``save()`` writes a side-by-side front|bird PNG."""

    def __init__(self):
        self._front = None
        self._bird = None

    def update(self, system, front_gray, bird_gray, contour=None):
        f = system.last_frame
        if f is None:
            return
        assoc = system.last_assoc
        fm = (np.asarray(assoc.mp_idx) >= 0) if assoc is not None \
            else np.zeros(np.asarray(f.uv_raw).shape[0], bool)
        bm = (np.asarray(assoc.bp_idx) >= 0) if assoc is not None \
            else np.zeros(np.asarray(f.bird_uv).shape[0], bool)
        self._front = draw_frame_overlay(
            front_gray, f.uv_raw, fm, f.kp_valid, state=system.state)
        self._bird = draw_bird_overlay(
            bird_gray, f.bird_uv, bm, f.bird_kp_valid, contour=contour)

    def save(self, path: str) -> None:
        if self._front is None:
            return
        # matplotlib.image.imsave needs no figure/backend — a save-time
        # matplotlib.use("Agg") would be silently ignored if pyplot was already
        # imported with another backend (round-2 advisor finding)
        import matplotlib.image as mpimg
        hf, wf = self._front.shape[:2]
        hb, wb = self._bird.shape[:2]
        h = max(hf, hb)
        canvas = np.zeros((h, wf + wb, 3), np.uint8)
        canvas[:hf, :wf] = self._front
        canvas[:hb, wf:] = self._bird
        mpimg.imsave(path, canvas)


def plot_map(m, cfg, path: str, gt_se2=None, est_Twb=None) -> None:
    """Top-down map plot: front/bird points, keyframes, covisibility edges."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from fishbirdeyevisualslam_tpu.geometry import se3, ipm
    from fishbirdeyevisualslam_tpu.slam import map_state as ms

    fig, ax = plt.subplots(figsize=(9, 9))
    mp = np.asarray(m.mp_pos)[np.asarray(m.mp_valid)]
    bp = np.asarray(m.bp_pos)[np.asarray(m.bp_valid)]
    # world here is the first camera frame; project to the first base frame
    Tbc = ipm.extrinsics_Tbc(cfg.extrinsics)

    def to_base(pts):
        return np.asarray(se3.transform(Tbc, jnp.asarray(pts)))

    if len(mp):
        p = to_base(mp)
        ax.scatter(p[:, 0], p[:, 1], s=1, c="#888888", label="map points")
    if len(bp):
        p = to_base(bp)
        ax.scatter(p[:, 0], p[:, 1], s=2, c="#2a7", label="bird points")

    n = int(m.n_kf)
    kf_xy = []
    for k in range(n):
        if not bool(m.kf_valid[k]):
            continue
        Twb = ipm.Twb_from_Twc(cfg.extrinsics, se3.inverse(m.kf_Tcw[k]))
        base0 = np.asarray(se3.compose(se3.inverse(ipm.extrinsics_Tbc(cfg.extrinsics)),
                                       jnp.asarray(Twb)))
        kf_xy.append(np.asarray(Twb)[4:6])
    if kf_xy:
        kf_xy = np.stack(kf_xy)
        C = np.asarray(ms.covisibility_counts(m))
        idx = [k for k in range(n) if bool(m.kf_valid[k])]
        for a_i, a in enumerate(idx):
            for b_i, b in enumerate(idx):
                if b > a and C[a, b] >= 15:
                    ax.plot(kf_xy[[a_i, b_i], 0], kf_xy[[a_i, b_i], 1],
                            c="#ccddee", lw=0.5, zorder=1)
        ax.plot(kf_xy[:, 0], kf_xy[:, 1], "o-", c="#06c", ms=4, label="keyframes")
    if est_Twb is not None:
        ax.plot(est_Twb[:, 4], est_Twb[:, 5], c="#e60", lw=1, label="frame est")
    if gt_se2 is not None:
        ax.plot(gt_se2[:, 0] - gt_se2[0, 0], gt_se2[:, 1] - gt_se2[0, 1],
                "--", c="#0a0", lw=1, label="GT (rel)")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    ax.set_title("fishbirdeyevisualslam_tpu map")
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)
