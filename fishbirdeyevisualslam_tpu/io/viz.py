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
