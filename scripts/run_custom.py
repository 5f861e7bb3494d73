#!/usr/bin/env python
"""Run the TPU-native BundleSDF on a custom RGBD video directory
(``rgb/ depth/ masks/ cam_K.txt`` layout).

Parity with the reference run_custom.py (modes run_video / global_refine /
draw_pose, :211-229; per-run config dumps :23-63).
"""
import argparse
import logging
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bundlesdf_tpu.config import (behave_track_config, default_nof_config,
                                  default_track_config, ycbineoat_track_config)

TRACK_CONFIGS = {
    "custom": default_track_config,
    "ho3d": default_track_config,
    "ycbineoat": ycbineoat_track_config,
    "behave": behave_track_config,
}
from bundlesdf_tpu.io.readers import YcbineoatReader
from bundlesdf_tpu.pipeline.bundlesdf import BundleSdf
from bundlesdf_tpu.pipeline.artifacts import load_tracked_frames


def run_one_video(video_dir, out_folder, use_segmenter=False, use_nof=True,
                  stride=1, debug_level=1, shorter_side=480, use_gui=False,
                  dataset="custom"):
    os.makedirs(out_folder, exist_ok=True)
    cfg_track = TRACK_CONFIGS[dataset]()
    cfg_track["SPDLOG"] = debug_level
    if dataset == "custom":
        cfg_track["depth_processing"]["zfar"] = 1.0
    cfg_track["debug_dir"] = out_folder
    cfg_nof = default_nof_config()
    cfg_nof["save_dir"] = out_folder
    # reserve the full-run ray pool: one train-program compile per run.
    # Sized from the video length (~120K masked rays/frame at 480p) — an
    # undersized reserve doubles mid-run and each doubling recompiles the
    # scanned train loop (~3-5 min on the tunneled TPU).
    import math as _math
    n_video_frames = len(
        [f for f in os.listdir(os.path.join(video_dir, "rgb"))]
    ) if video_dir else 12
    est = max(1, min(n_video_frames, 300)) * 120_000
    cfg_nof["ray_pool_reserve_log2"] = min(23, max(20, _math.ceil(_math.log2(est))))
    # config-as-artifact (reference run_custom.py:23-63)
    cfg_track.save(f"{out_folder}/config_track.yml")
    cfg_nof.save(f"{out_folder}/config_nerf.yml")

    reader = YcbineoatReader(video_dir=video_dir, shorter_side=shorter_side)
    tracker = BundleSdf(
        cfg_track=cfg_track, cfg_nof=cfg_nof, out_dir=out_folder,
        use_nof=use_nof, save_artifacts=True, use_gui=use_gui,
    )
    for i in range(0, len(reader.color_files), stride):
        color = reader.get_color(i)
        depth = reader.get_depth(i)
        mask = reader.get_mask(i)
        if i == 0:
            mask = cv2.erode(mask.astype(np.uint8), np.ones((5, 5), np.uint8))
        occ = reader.get_occ_mask(i)
        occ = occ if occ.any() else None
        tracker.run(color, depth, reader.K, reader.id_strs[i], mask=mask,
                    occ_mask=occ)
    mesh = tracker.on_finish()
    if mesh is not None:
        mesh.export(f"{out_folder}/mesh_online.obj")
    if debug_level >= 1:
        from bundlesdf_tpu.utils.profiler import report

        print(report(min_total=0.01))
    print(f"done: {len(tracker.poses_log)} frames -> {out_folder}/ob_in_cam")


def run_one_video_global_nerf(out_folder, get_texture=True, refine_steps=None):
    frames = load_tracked_frames(out_folder)
    if not frames:
        raise RuntimeError(f"no tracked frames under {out_folder} (run run_video first)")
    cfg_track = default_track_config()
    tracker = BundleSdf(cfg_track=cfg_track, out_dir=out_folder, use_nof=False)
    # reuse the exact online normalization when the tracked run saved it
    # (config-as-artifact; reference bundlesdf.py:696-700)
    cfg_path = f"{out_folder}/config_nerf.yml"
    if os.path.exists(cfg_path):
        from bundlesdf_tpu.config import Cfg

        saved = Cfg.load(cfg_path)
        if float(saved.get("sc_factor", 1.0)) != 1.0:
            tracker.cfg_nof = tracker.cfg_nof.merged(
                {"sc_factor": saved["sc_factor"], "translation": saved["translation"]})
            tracker.sc_factor = float(saved["sc_factor"])
            tracker.translation = np.asarray(saved["translation"])
    K_file = f"{os.path.dirname(out_folder)}/cam_K.txt"
    tracker.K = np.loadtxt(K_file).reshape(3, 3).astype(np.float32) if os.path.exists(K_file) else None
    if tracker.K is None:
        h, w = frames[0]["depth"].shape
        tracker.K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
    cfg_refine = None
    if refine_steps:
        from bundlesdf_tpu.config import default_nof_config

        cfg_refine = tracker.cfg_nof.merged({
            "n_step": int(refine_steps), "N_samples": 64,
            "N_samples_around_depth": 256, "num_levels": 16,
            "finest_res": 256, "frame_features": 2, "rgb_weight": 100.0,
            "loop_chunk": 10,
        })
    mesh, poses = tracker.run_global_nerf(frames, get_texture=get_texture,
                                          cfg_refine=cfg_refine)
    if getattr(mesh, "face_uv", None) is not None and getattr(tracker, "texture", None) is not None:
        from bundlesdf_tpu.nof.texture import export_textured_obj

        export_textured_obj(mesh, tracker.texture, f"{out_folder}/textured_mesh.obj")
    else:
        mesh.export(f"{out_folder}/textured_mesh.obj")
    np.savetxt(f"{out_folder}/poses_after_global_refine.txt", poses.reshape(-1, 4))
    print(f"global refine done -> {out_folder}/textured_mesh.obj")


def draw_pose(video_dir, out_folder):
    from bundlesdf_tpu.viz.draw import draw_posed_3d_box, draw_xyz_axis

    reader = YcbineoatReader(video_dir=video_dir, shorter_side=480)
    os.makedirs(f"{out_folder}/pose_vis", exist_ok=True)
    for i, id_str in enumerate(reader.id_strs):
        pose_file = f"{out_folder}/ob_in_cam/{id_str}.txt"
        if not os.path.exists(pose_file):
            continue
        ob_in_cam = np.loadtxt(pose_file).reshape(4, 4)
        color = reader.get_color(i)
        vis = draw_xyz_axis(color, ob_in_cam, reader.K, scale=0.05)
        cv2.imwrite(f"{out_folder}/pose_vis/{id_str}.png", vis[..., ::-1])
    print(f"pose visualizations -> {out_folder}/pose_vis")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="run_video",
                   choices=["run_video", "global_refine", "draw_pose"])
    p.add_argument("--video_dir", default="")
    p.add_argument("--out_folder", required=True)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--no_nerf", action="store_true")
    p.add_argument("--debug_level", type=int, default=1)
    p.add_argument("--shorter_side", type=int, default=480)
    p.add_argument("--use_gui", action="store_true")
    p.add_argument("--dataset", default="custom", choices=sorted(TRACK_CONFIGS))
    p.add_argument("--refine_steps", type=int, default=0,
                   help="override offline n_step (reference 2000); use a "
                        "few hundred for quick verification runs")
    p.add_argument("--log_compiles", action="store_true",
                   help="log every XLA compilation (compile time dominates "
                        "first-run wall clock; use to hunt shape churn)")
    args = p.parse_args()
    if args.log_compiles:
        import jax

        jax.config.update("jax_log_compiles", True)
    if args.mode == "run_video":
        run_one_video(args.video_dir, args.out_folder, use_nof=not args.no_nerf,
                      stride=args.stride, debug_level=args.debug_level,
                      shorter_side=args.shorter_side, use_gui=args.use_gui,
                      dataset=args.dataset)
    elif args.mode == "global_refine":
        run_one_video_global_nerf(args.out_folder, refine_steps=args.refine_steps)
    else:
        draw_pose(args.video_dir, args.out_folder)
