#!/usr/bin/env python
"""HO3D-difficulty synthetic benchmark (VERDICT r1 #3).

Generates the hard blob fixture (tests/synthetic_hard.py: non-convex
textured object, 90-degree-plus total rotation, moving finger occluder,
depth noise), runs the full online pipeline once per matcher engine, and
reports ADD / ADD-S AUC + mean errors through the same mechanics as
scripts/benchmark_ho3d.py (first-frame alignment, 0.1 m AUC threshold —
reference /root/reference/benchmark_ho3d.py:18-139), plus mesh chamfer
against the analytic union surface.

Usage:
  python scripts/benchmark_synth.py [--out EVAL_synth.json]
      [--matchers corner,sift] [--frames 14] [--deg 7] [--workdir /tmp/synth_hard]
Writes one JSON file with a section per matcher.
"""
import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def run_engine(video_dir, out_folder, matcher, loftr_ckpt="", sync_max_delay=None,
               n_step_extend=None):
    import cv2
    from bundlesdf_tpu.config import default_nof_config, ycbineoat_track_config
    from bundlesdf_tpu.io.readers import YcbineoatReader
    from bundlesdf_tpu.pipeline.bundlesdf import BundleSdf
    from bundlesdf_tpu.utils import profiler

    profiler.reset()

    # The fixture is YCBInEOAT-layout with handheld-style motion; the
    # matching reference config (config_ycbineoat.yml) uses
    # max_trans_neighbor 0.03.  The HO3D config's 0.02 gate sits under the
    # fixture's legitimate ~2.2 cm per-frame camera step (GT wobble +
    # rotation of the recentered origin), which FAILed one mid-occlusion
    # frame per run in round 2 (diagnosed round 3: the BA pose was ~0.5 cm
    # off GT; forget-and-relocalize recovered it by design).
    cfg_track = ycbineoat_track_config()
    # engine spec "name:variant" — variants: "split" disables the fused
    # match+BA program (A/B of VERDICT r4 task #1 within one session)
    variant = ""
    if ":" in matcher:
        matcher, variant = matcher.split(":", 1)
    if variant == "split":
        cfg_track["bundle"]["fused_ba"] = False
    cfg_track["feature_corres"]["matcher"] = matcher
    if loftr_ckpt:
        cfg_track["feature_corres"]["loftr_ckpt"] = loftr_ckpt
    cfg_track["depth_processing"]["zfar"] = 1.0
    cfg_track["debug_dir"] = out_folder
    # dump the full artifact trail (color_segmented/depth_filtered/mask):
    # --global_refine restarts from it alone (the reference's
    # output-directory-is-the-checkpoint contract, run_custom debug>=2)
    cfg_track["SPDLOG"] = max(2, int(cfg_track.get("SPDLOG", 1)))
    cfg_nof = default_nof_config()
    cfg_nof["save_dir"] = out_folder
    if sync_max_delay is not None:
        cfg_nof["sync_max_delay"] = int(sync_max_delay)
    if n_step_extend is not None:
        cfg_nof["n_step_extend"] = int(n_step_extend)
    # A/B isolation knob for the cache-grad reduce engine (auto|conv|pallas).
    if os.environ.get("BSL_HASH_REDUCE"):
        cfg_nof["hash_reduce"] = os.environ["BSL_HASH_REDUCE"]
    import math

    n_video = len(os.listdir(os.path.join(video_dir, "rgb")))
    cfg_nof["ray_pool_reserve_log2"] = min(
        23, max(20, math.ceil(math.log2(max(1, n_video) * 120_000))))
    os.makedirs(out_folder, exist_ok=True)
    cfg_track.save(f"{out_folder}/config_track.yml")
    cfg_nof.save(f"{out_folder}/config_nerf.yml")

    reader = YcbineoatReader(video_dir=video_dir, shorter_side=480)
    tracker = BundleSdf(cfg_track=cfg_track, cfg_nof=cfg_nof,
                        out_dir=out_folder, use_nof=True, save_artifacts=True)
    t0 = time.perf_counter()
    n_fail = 0
    failed_frames = []
    t_marks = []
    half_snapshot = None
    half_steps = 0
    n_total = len(reader.color_files)
    for i in range(n_total):
        color = reader.get_color(i)
        depth = reader.get_depth(i)
        mask = reader.get_mask(i)
        if i == 0:
            mask = cv2.erode(mask.astype(np.uint8), np.ones((5, 5), np.uint8))
        occ = reader.get_occ_mask(i)
        occ = occ if occ is not None and occ.any() else None
        frame = tracker.run(color, depth, reader.K, reader.id_strs[i],
                            mask=mask, occ_mask=occ)
        t_marks.append(time.perf_counter())
        if i == n_total // 2:
            # warm-window snapshot (same definition as warm_fps): the
            # overlap/choreography metrics over the second half exclude
            # the first half's one-time XLA compiles
            half_snapshot = {k: dict(v) for k, v in
                             profiler.stats().items()}
            half_steps = (tracker.nof.total_step
                          if tracker.nof is not None else 0)
        if frame is not None and int(getattr(frame, "status", 0)) != 0:
            n_fail += 1
            failed_frames.append(i)
    # end-of-loop snapshot: the warm window must not absorb on_finish's
    # final drains (they fall outside its wall)
    loop_snapshot = {k: dict(v) for k, v in profiler.stats().items()}
    loop_steps = tracker.nof.total_step if tracker.nof is not None else 0
    mesh = tracker.on_finish()
    wall = time.perf_counter() - t0
    # warm-cache fps: the second half of the video (every distinct XLA
    # program — matcher/RANSAC/BA/NOF round shapes — compiles in the first
    # half at the fixed pair_batch / ray-pool reserve)
    half = len(t_marks) // 2
    warm_fps = ((len(t_marks) - 1 - half) / (t_marks[-1] - t_marks[half])
                if len(t_marks) - 1 > half else 0.0)
    if mesh is not None:
        mesh.export(f"{out_folder}/mesh_online.obj")
    # per-stage profile (VERDICT r2 #1: span report in the artifact)
    st = profiler.stats()
    prof = {
        k: {"count": v["count"], "total_s": round(v["total_s"], 2)}
        for k, v in sorted(st.items(), key=lambda kv: -kv[1]["total_s"])
        if v["total_s"] >= 0.5 or k.startswith(("launch/", "readback/"))
    }
    # Overlap + choreography accounting (VERDICT r4 #1/#2): how much NOF
    # device time was hidden under host tracking, and how many device
    # dispatches / blocking readbacks the host issued per frame.  Whole-run
    # AND warm-window (second half, compile-free — same window as
    # warm_fps) variants.
    n_frames = len(t_marks)

    def _window(stats_now, stats_base, steps_now, steps_base, wall_w, n_fr):
        d = {}
        for k, v in stats_now.items():
            base = (stats_base or {}).get(k, {"count": 0, "total_s": 0.0})
            d[k] = {"count": v["count"] - base["count"],
                    "total_s": v["total_s"] - base["total_s"]}
        out = {}
        if tracker.nof is not None and getattr(tracker.nof, "_step_ms", 0.0):
            step_ms = float(tracker.nof._step_ms)
            nof_device_s = (steps_now - steps_base) * step_ms / 1e3
            blocked_s = sum(d.get(k, {"total_s": 0.0})["total_s"]
                            for k in ("nof/sync_wait", "nof/train_drain"))
            out.update({
                "nof_steps": int(steps_now - steps_base),
                "nof_step_ms": round(step_ms, 2),
                "nof_device_s": round(nof_device_s, 2),
                "blocked_wait_s": round(blocked_s, 2),
                "overlap_frac": round(max(
                    0.0, 1.0 - blocked_s / max(nof_device_s, 1e-9)), 3),
                "wall_minus_nof_device_s": round(wall_w - nof_device_s, 2),
            })
        launches = sum(v["count"] for k, v in d.items()
                       if k.startswith("launch/"))
        readbacks = sum(v["count"] for k, v in d.items()
                        if k.startswith("readback/"))
        out["launches_per_frame"] = round(launches / max(n_fr, 1), 2)
        out["readbacks_per_frame"] = round(readbacks / max(n_fr, 1), 2)
        return out

    steps_total = tracker.nof.total_step if tracker.nof is not None else 0
    prof["overlap"] = _window(st, None, steps_total, 0, wall, n_frames)
    if half_snapshot is not None:
        prof["overlap_warm"] = _window(
            loop_snapshot, half_snapshot, loop_steps, half_steps,
            t_marks[-1] - t_marks[half], n_frames - 1 - half)
    prof["launches_per_frame"] = prof["overlap"].pop("launches_per_frame")
    prof["readbacks_per_frame"] = prof["overlap"].pop("readbacks_per_frame")
    return wall, warm_fps, n_fail, failed_frames, prof


def run_global_refine(video_dir, out_folder, refine_steps=None):
    """Offline global refinement on the online outputs at the reference
    offline budget (run_custom.py:111-133 / VERDICT r2 #4).  Returns the
    wall time; the textured mesh lands at out_folder/textured_mesh.obj."""
    import shutil

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_custom import run_one_video_global_nerf

    # run_custom resolves K from the out_folder's parent
    k_src = os.path.join(video_dir, "cam_K.txt")
    k_dst = os.path.join(os.path.dirname(out_folder), "cam_K.txt")
    if os.path.exists(k_src) and not os.path.exists(k_dst):
        shutil.copy(k_src, k_dst)
    t0 = time.perf_counter()
    run_one_video_global_nerf(out_folder, get_texture=True,
                              refine_steps=refine_steps)
    return time.perf_counter() - t0


def evaluate(video_dir, out_folder, mesh_name="mesh_online.obj"):
    from synthetic_hard import blob_surface_distance
    from bundlesdf_tpu.utils import metrics

    gts = np.load(f"{video_dir}/gt_ob_in_cam.npy")
    model_pts = np.load(f"{video_dir}/gt_model_points.npy")
    pred_files = sorted(glob.glob(f"{out_folder}/ob_in_cam/*.txt"))
    preds = np.stack([np.loadtxt(f).reshape(4, 4) for f in pred_files])
    gts = gts[: len(preds)]
    res = metrics.trajectory_add_auc(preds, gts, model_pts, max_val=0.1)
    out = {
        "n_frames": len(preds),
        "ADD_AUC": round(res["add_auc"] * 100, 2),
        "ADDS_AUC": round(res["adds_auc"] * 100, 2),
        "mean_ADD_cm": round(res["mean_add"] * 100, 3),
        "mean_ADDS_cm": round(res["mean_adds"] * 100, 3),
    }
    mesh_file = f"{out_folder}/{mesh_name}"
    if os.path.exists(mesh_file):
        # mesh is in the object frame of the FIRST prediction; move to GT
        # object frame via pose composition then closed-form blob distance
        vs = []
        with open(mesh_file) as f:
            for line in f:
                if line.startswith("v "):
                    vs.append([float(x) for x in line.split()[1:4]])
        if vs:
            v = np.asarray(vs)
            T = np.linalg.inv(gts[0]) @ preds[0]
            v = v @ T[:3, :3].T + T[:3, 3]
            # crop floaters far outside the object bbox (|0.22 m extent|)
            v = v[np.linalg.norm(v, axis=-1) < 0.3]
            if len(v):
                out["mesh_mean_dist_cm"] = round(
                    float(np.mean(blob_surface_distance(v))) * 100, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_synth.json")
    ap.add_argument("--matchers", default="corner,sift")
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--deg", type=float, default=7.0)
    ap.add_argument("--workdir", default="/tmp/synth_hard")
    ap.add_argument("--skip_gen", action="store_true")
    ap.add_argument("--skip_online", action="store_true",
                    help="reuse existing out_<matcher> run directories")
    ap.add_argument("--loftr_ckpt", default="",
                    help=".npz weights for the loftr engine")
    ap.add_argument("--sync_delay", type=int, default=None,
                    help="override cfg_nof sync_max_delay")
    ap.add_argument("--extend", type=int, default=None,
                    help="override cfg_nof n_step_extend (steps per "
                         "continual NOF extension round)")
    ap.add_argument("--global_refine", action="store_true",
                    help="after the FIRST matcher's online run, run the "
                         "offline global refine at the reference budget "
                         "and report post-refine mesh quality")
    ap.add_argument("--refine_steps", type=int, default=None)
    args = ap.parse_args()

    video_dir = os.path.join(args.workdir, "video")
    if not args.skip_gen or not os.path.isdir(video_dir):
        from synthetic_hard import make_hard_video

        make_hard_video(video_dir, n_frames=args.frames, deg_step=args.deg)
        print("fixture:", video_dir, flush=True)

    report = {}
    if os.path.isfile(args.out):
        # merge: a single-engine rerun must not clobber the other
        # engines' committed sections
        with open(args.out) as f:
            report = json.load(f)
    fixture = {
        "frames": args.frames,
        "total_rotation_deg": args.deg * (args.frames - 1),
        "occluder": True,
        "depth_noise_m": 0.0015,
        "noise_model": "spatially-correlated (10 px) + 2% dropout + mm quantization",
    }
    if args.sync_delay is not None:
        fixture["sync_max_delay"] = args.sync_delay
    if args.extend is not None:
        fixture["n_step_extend"] = args.extend
    # A rerun with different --frames/--deg/--sync_delay must not silently
    # keep engine sections measured against a different fixture: each engine
    # section records the fixture it was measured on, and stale ones are
    # dropped at merge time (ADVICE r3 #4).
    fix_key = json.dumps(fixture, sort_keys=True)
    for k in [k for k, v in report.items()
              if isinstance(v, dict) and k != "fixture"
              and json.dumps(v.get("fixture", None), sort_keys=True) != fix_key]:
        print(f"dropping stale section {k!r} (fixture mismatch)", flush=True)
        del report[k]
    report["fixture"] = fixture
    matchers = [m.strip() for m in args.matchers.split(",") if m.strip()]
    for m in matchers:
        out_folder = os.path.join(args.workdir, f"out_{m.replace(':', '_')}")
        prof = None
        if not args.skip_online:
            # the tunneled TPU's remote compiler flakes occasionally
            # ("response body closed", HTTP 500); a full-engine retry is
            # the only sound recovery (pipeline state is mid-flight)
            for attempt in range(3):
                try:
                    wall, warm_fps, n_fail, failed, prof = run_engine(
                        video_dir, out_folder, m, loftr_ckpt=args.loftr_ckpt,
                        sync_max_delay=args.sync_delay,
                        n_step_extend=args.extend)
                    break
                except Exception as e:
                    print(f"{m} attempt {attempt} failed: {e}", flush=True)
                    if attempt == 2:
                        raise
                    time.sleep(60.0 * (attempt + 1))
        else:
            wall, warm_fps, n_fail, failed = 0.0, 0.0, -1, []
        r = evaluate(video_dir, out_folder)
        if wall:
            r["wall_s"] = round(wall, 1)
            r["fps"] = round(args.frames / wall, 4)
            r["warm_fps"] = round(warm_fps, 4)
            r["n_tracking_fail"] = n_fail
            r["failed_frames"] = failed
        if prof:
            r["profile"] = prof
        r["fixture"] = fixture
        report[m] = r
        print(m, json.dumps(r), flush=True)

    if args.global_refine and matchers:
        out_folder = os.path.join(args.workdir, f"out_{matchers[0]}")
        wall = run_global_refine(video_dir, out_folder,
                                 refine_steps=args.refine_steps)
        r = evaluate(video_dir, out_folder, mesh_name="textured_mesh.obj")
        r = {"matcher": matchers[0],
             "refine_steps": args.refine_steps or 2000,
             "mesh_mean_dist_cm": r.get("mesh_mean_dist_cm"),
             "textured": True, "wall_s": round(wall, 1),
             "fixture": fixture}
        report["global_refine"] = r
        print("global_refine", json.dumps(r), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
