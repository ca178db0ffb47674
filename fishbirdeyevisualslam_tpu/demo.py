"""End-to-end demo on a synthetic sequence: run `python -m fishbirdeyevisualslam_tpu.demo`.

Renders a dual-view driving sequence (no dataset required), runs the full SLAM,
prints per-frame timing (the reference's exit stats, ``mono_encoder.cc:202-210``),
the ATE vs ground truth, and writes ``demo_map.png`` + ``demo_traj.tum``.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--kind", default="arc",
                    choices=["arc", "straight", "s", "circle", "rect"])
    ap.add_argument("--no-contour", action="store_true",
                    help="skip the contourICP keypoint gating")
    ap.add_argument("--step", type=float, default=0.5)
    ap.add_argument("--odom-noise", type=float, default=0.004)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--out-prefix", default="demo")
    ap.add_argument("--draw-every", type=int, default=0, metavar="N",
                    help="export a FrameDrawer overlay PNG every N frames "
                         "(<prefix>_frame_<i>.png); 0 = off")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fishbirdeyevisualslam_tpu.config import SystemConfig
    from fishbirdeyevisualslam_tpu.io import synthetic, viz
    from fishbirdeyevisualslam_tpu.io.evaluate import ate_rmse_vs_gt
    from fishbirdeyevisualslam_tpu.slam.system import SlamSystem

    cfg = SystemConfig()
    print(f"rendering {args.frames}-frame '{args.kind}' sequence ...")
    seq = synthetic.make_sequence(
        cfg, n_frames=args.frames, kind=args.kind, step=args.step,
        odom_noise=args.odom_noise,
    )
    slam = SlamSystem(cfg)
    drawer = viz.FrameDrawer() if args.draw_every else None
    for i, fr in enumerate(seq.frames):
        contour = None if args.no_contour else fr.get("contour")
        slam.track(fr["front"], fr["bird"], fr["mask"], seq.odom[i], fr["timestamp"],
                   contour=contour)
        if drawer is not None and (i % args.draw_every == 0):
            drawer.update(slam, fr["front"], fr["bird"], contour=contour)
            drawer.save(f"{args.out_prefix}_frame_{i:04d}.png")
        print(f"\rframe {i + 1}/{args.frames} state={slam.state} "
              f"kf={int(slam.map.n_kf) if slam.map is not None else 0}", end="")
    print()
    est = slam.frame_trajectory_Twb()
    stats = {
        "ate_rmse_m": round(ate_rmse_vs_gt(est, seq.gt), 4),
        "n_keyframes": int(slam.map.kf_valid.sum()) if slam.map is not None else 0,
        "n_map_points": int(slam.map.mp_valid.sum()) if slam.map is not None else 0,
        "n_bird_points": int(slam.map.bp_valid.sum()) if slam.map is not None else 0,
        "loops_closed": slam.n_loops_closed,
        "timing": slam.timing_stats(),
    }
    print(json.dumps(stats, indent=2))
    with open(f"{args.out_prefix}_traj.tum", "w") as fh:
        fh.write(slam.keyframe_trajectory_tum())
    if slam.map is not None:
        from fishbirdeyevisualslam_tpu.io.evaluate import relative_xy_from_Twb
        viz.plot_map(slam.map, cfg, f"{args.out_prefix}_map.png",
                     gt_se2=seq.gt, est_Twb=est)
        print(f"wrote {args.out_prefix}_map.png, {args.out_prefix}_traj.tum")


if __name__ == "__main__":
    main()
