#!/usr/bin/env python
"""Long-video operation proof (VERDICT r2 #3): 200+-frame hard-fixture
variant (continued rotation past 360 deg -> natural revisits, moving
occluder, sensor noise), tracked end-to-end; commits EVAL_long.json with
pose AUC, fps, peak RSS, the number of train-program compiles (should be
1 thanks to ray_pool_reserve_log2), and the keyframe-pool trajectory.

Reference anchor: run_ho3d.py:107-119 tracks full ~1000-frame HO3D
sequences with the same window/keyframe/pool machinery.

Usage:
  python scripts/benchmark_long.py [--frames 200] [--deg 2.5]
      [--out EVAL_long.json] [--workdir /tmp/synth_long] [--sync_delay 3]
"""
import argparse
import glob
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def run_long(video_dir, out_folder, matcher, sync_delay, n_step_extend=None):
    import cv2
    import math
    from bundlesdf_tpu.config import default_nof_config, ycbineoat_track_config
    from bundlesdf_tpu.io.readers import YcbineoatReader
    from bundlesdf_tpu.pipeline.bundlesdf import BundleSdf

    # YCBInEOAT-layout fixture -> matching reference config (see
    # benchmark_synth.run_engine for the gate-threshold diagnosis).
    cfg_track = ycbineoat_track_config()
    cfg_track["feature_corres"]["matcher"] = matcher
    cfg_track["depth_processing"]["zfar"] = 1.0
    cfg_track["debug_dir"] = out_folder
    cfg_nof = default_nof_config()
    cfg_nof["save_dir"] = out_folder
    cfg_nof["sync_max_delay"] = int(sync_delay)
    if n_step_extend is not None:
        cfg_nof["n_step_extend"] = int(n_step_extend)
    n_video = len(os.listdir(os.path.join(video_dir, "rgb")))
    cfg_nof["ray_pool_reserve_log2"] = min(
        23, max(20, math.ceil(math.log2(max(1, n_video) * 120_000))))
    os.makedirs(out_folder, exist_ok=True)

    reader = YcbineoatReader(video_dir=video_dir, shorter_side=480)
    tracker = BundleSdf(cfg_track=cfg_track, cfg_nof=cfg_nof,
                        out_dir=out_folder, use_nof=True, save_artifacts=True)
    def _host_breakdown(tracker):
        """Attributable host-memory consumers, in GB (VERDICT r4 weak #6:
        the 24 GB peak RSS of a 200-frame run had no owner).  The residual
        rss - sum(attributed) is the JAX/PJRT client side (compiled
        programs, transfer staging, any host mirrors of device buffers)."""
        gb = 1 / 1e9
        out = {}
        nof = tracker.nof
        if nof is not None:
            out["nof_rays_np"] = nof.rays_np.nbytes * gb
            out["nof_images"] = (nof.images.nbytes + nof.depths.nbytes
                                 + nof.masks.nbytes) * gb
        fr_bytes = 0
        seen = set()
        for f in list(tracker.bundler.frames.values()) + \
                tracker.bundler.keyframes:
            if id(f) in seen:
                continue
            seen.add(id(f))
            for a in ("color", "depth", "xyz", "normals", "gray", "valid",
                      "fg_mask"):
                v = getattr(f, a, None)
                if isinstance(v, np.ndarray):
                    fr_bytes += v.nbytes
        out["frames"] = fr_bytes * gb
        st_bytes = 0
        for tbl in (tracker.bundler.store.raw,):
            for v in tbl.values():
                st_bytes += v.nbytes
        for m in tracker.bundler.store.matches.values():
            if m is not None:
                st_bytes += sum(v.nbytes for v in m.values()
                                if isinstance(v, np.ndarray))
        out["match_tables"] = st_bytes * gb
        return {k: round(v, 3) for k, v in out.items()}

    t0 = time.perf_counter()
    n_fail = 0
    kf_sizes = []
    pool_caps = set()
    tracks_parent_sizes = []
    rss_curve = []
    for i in range(len(reader.color_files)):
        color = reader.get_color(i)
        depth = reader.get_depth(i)
        mask = reader.get_mask(i)
        if i == 0:
            mask = cv2.erode(mask.astype(np.uint8), np.ones((5, 5), np.uint8))
        occ = reader.get_occ_mask(i)
        occ = occ if occ is not None and occ.any() else None
        frame = tracker.run(color, depth, reader.K, reader.id_strs[i],
                            mask=mask, occ_mask=occ)
        if frame is not None and int(getattr(frame, "status", 0)) != 0:
            n_fail += 1
        kf_sizes.append(len(tracker.bundler.keyframes))
        tracks_parent_sizes.append(len(tracker.bundler.store.tracks._parent))
        if tracker.nof is not None:
            pool_caps.add(int(tracker.nof.rays_dev.shape[0]))
        if i % 10 == 0 or i == len(reader.color_files) - 1:
            rss_gb = resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss / 1e6
            bd = _host_breakdown(tracker)
            bd.update(frame=i, rss_gb=round(rss_gb, 2), unattributed=round(
                rss_gb - sum(v for k, v in bd.items()
                             if k not in ("frame",)), 2))
            rss_curve.append(bd)
    mesh = tracker.on_finish()
    wall = time.perf_counter() - t0
    if mesh is not None:
        mesh.export(f"{out_folder}/mesh_online.obj")
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    return dict(
        wall_s=round(wall, 1),
        fps=round(len(reader.color_files) / wall, 4),
        n_tracking_fail=n_fail,
        peak_rss_gb=round(peak_rss_gb, 2),
        n_train_program_shapes=len(pool_caps),
        ray_pool_caps=sorted(pool_caps),
        kf_pool_over_time=kf_sizes[:: max(1, len(kf_sizes) // 50)],
        kf_pool_final=kf_sizes[-1],
        tracks_parent_final=tracks_parent_sizes[-1],
        tracks_parent_max=max(tracks_parent_sizes),
        rss_curve=rss_curve[:: max(1, len(rss_curve) // 12)] + rss_curve[-1:],
    )


def evaluate(video_dir, out_folder):
    from bundlesdf_tpu.utils import metrics

    gts = np.load(f"{video_dir}/gt_ob_in_cam.npy")
    model_pts = np.load(f"{video_dir}/gt_model_points.npy")
    pred_files = sorted(glob.glob(f"{out_folder}/ob_in_cam/*.txt"))
    preds = np.stack([np.loadtxt(f).reshape(4, 4) for f in pred_files])
    gts = gts[: len(preds)]
    res = metrics.trajectory_add_auc(preds, gts, model_pts, max_val=0.1)
    return {
        "n_frames": len(preds),
        "ADD_AUC": round(res["add_auc"] * 100, 2),
        "ADDS_AUC": round(res["adds_auc"] * 100, 2),
        "mean_ADD_cm": round(res["mean_add"] * 100, 3),
        "mean_ADDS_cm": round(res["mean_adds"] * 100, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_long.json")
    ap.add_argument("--matcher", default="corner")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--deg", type=float, default=2.5)
    ap.add_argument("--sync_delay", type=int, default=3)
    ap.add_argument("--extend", type=int, default=None,
                    help="override cfg_nof n_step_extend")
    ap.add_argument("--workdir", default="/tmp/synth_long")
    ap.add_argument("--skip_gen", action="store_true")
    args = ap.parse_args()

    video_dir = os.path.join(args.workdir, "video")
    if not args.skip_gen or not os.path.isdir(video_dir):
        from synthetic_hard import make_hard_video

        make_hard_video(video_dir, n_frames=args.frames, deg_step=args.deg)
        print("fixture:", video_dir, flush=True)

    out_folder = os.path.join(args.workdir, f"out_{args.matcher}")
    # full-run retry on transient tunnel compile failures (see
    # benchmark_synth.py)
    for attempt in range(3):
        try:
            stats = run_long(video_dir, out_folder, args.matcher,
                             args.sync_delay, n_step_extend=args.extend)
            break
        except Exception as e:
            print(f"attempt {attempt} failed: {e}", flush=True)
            if attempt == 2:
                raise
            time.sleep(60.0 * (attempt + 1))
    report = {
        "fixture": {
            "frames": args.frames,
            "deg_per_frame": args.deg,
            "total_rotation_deg": args.deg * (args.frames - 1),
            "occluder": True,
            "sync_max_delay": args.sync_delay,
            "n_step_extend": args.extend,
        },
        args.matcher: {**evaluate(video_dir, out_folder), **stats},
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report[args.matcher], indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
