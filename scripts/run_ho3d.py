#!/usr/bin/env python
"""Batch-run the pipeline over HO3D_v3 evaluation sequences
(parity with reference run_ho3d.py:107-119: loops videos, skip-if-complete
idempotency :24-28)."""
import argparse
import logging
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bundlesdf_tpu.config import default_nof_config, default_track_config
from bundlesdf_tpu.io.readers import Ho3dReader
from bundlesdf_tpu.pipeline.bundlesdf import BundleSdf

HO3D_VIDEOS = ["AP10", "AP11", "AP12", "AP13", "AP14", "MPM10", "MPM11",
               "MPM12", "MPM13", "MPM14", "SB11", "SB13", "SM1"]


def run_one_video(video_dir, out_folder, use_nof=True):
    reader = Ho3dReader(video_dir)
    done_marker = f"{out_folder}/ob_in_cam/{reader.id_strs[-1]}.txt"
    if os.path.exists(done_marker):
        print(f"skip {video_dir} (complete)")
        return
    os.makedirs(out_folder, exist_ok=True)
    cfg_track = default_track_config()
    cfg_track["debug_dir"] = out_folder
    cfg_nof = default_nof_config()
    cfg_nof["save_dir"] = out_folder
    # one train-program compile per video: reserve the ray pool for the
    # full sequence (~120K masked rays/frame at 640x480), capped by
    # ray_pool_max_log2 (see run_custom.py)
    import math as _math
    est = max(1, min(len(reader), 300)) * 120_000
    cfg_nof["ray_pool_reserve_log2"] = min(23, max(20, _math.ceil(_math.log2(est))))
    cfg_track.save(f"{out_folder}/config_track.yml")
    cfg_nof.save(f"{out_folder}/config_nerf.yml")
    tracker = BundleSdf(cfg_track=cfg_track, cfg_nof=cfg_nof,
                        out_dir=out_folder, use_nof=use_nof, save_artifacts=True)
    for i in range(len(reader)):
        color = reader.get_color(i)
        depth = reader.get_depth(i)
        mask = reader.get_mask(i)
        occ = reader.get_occ_mask(i)
        tracker.run(color, depth, reader.K, reader.id_strs[i], mask=mask,
                    occ_mask=occ)
    mesh = tracker.on_finish()
    if mesh is not None:
        mesh.export(f"{out_folder}/mesh_online.obj")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--ho3d_dir", required=True, help="HO3D_v3 root")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--video_names", nargs="*", default=None)
    p.add_argument("--no_nerf", action="store_true")
    p.add_argument("--shard", default="0/1",
                   help="i/n — process every n-th video starting at i "
                        "(embarrassingly-parallel multi-host scale-out; "
                        "SURVEY.md 2.5: reference loops videos serially)")
    args = p.parse_args()
    names = args.video_names or HO3D_VIDEOS
    si, sn = (int(x) for x in args.shard.split("/"))
    names = names[si::sn]
    for name in names:
        video_dir = f"{args.ho3d_dir}/evaluation/{name}"
        if not os.path.isdir(video_dir):
            print(f"missing {video_dir}, skip")
            continue
        run_one_video(video_dir, f"{args.out_dir}/{name}", use_nof=not args.no_nerf)
