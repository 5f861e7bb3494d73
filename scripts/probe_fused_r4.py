#!/usr/bin/env python
"""Time the fused find_corres path on the real chip (round 4).

Reports: pool upload per frame, warm fused call at P=1 and P=pair_batch,
vs the round-3 legacy numbers (probe_corres_r4.py: 321 ms P=1, 1350 ms P=16).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    import jax
    from synthetic_hard import render_blob_rgbd
    from scipy.spatial.transform import Rotation
    from bundlesdf_tpu.config import ycbineoat_track_config
    from bundlesdf_tpu.tracking.frame import Frame
    from bundlesdf_tpu.tracking import corres
    from bundlesdf_tpu.utils import profiler

    print(f"devices: {jax.devices()}", flush=True)

    cfg = ycbineoat_track_config()
    cfg["depth_processing"]["zfar"] = 1.0
    H = W = 480
    K = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
    frames = []
    axis = np.array([0, 1, 0.2]); axis = axis / np.linalg.norm(axis)
    for k in range(6):
        R = Rotation.from_rotvec(axis * np.deg2rad(5.0 * k)).as_matrix()
        T = np.eye(4); T[:3, :3] = R; T[:3, 3] = [0, 0, 0.55]
        rgb, depth, mask = render_blob_rgbd(T, K, H, W)
        f = Frame(rgb, depth, K, id=k, id_str=f"{k:05d}", cfg=cfg,
                  fg_mask=mask > 0)
        f.pose_in_model = np.linalg.inv(T).astype(np.float32)
        frames.append(f)

    store = corres.CorresStore(cfg)
    assert store.use_fused
    key = jax.random.PRNGKey(0)

    # warmup + compile (P=1 bucket)
    t0 = time.perf_counter()
    corres.find_corres(store, [(frames[1], frames[0])], cfg, key=key)
    print(f"P=1 compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    # pool upload timing (fresh frames 2..5)
    t0 = time.perf_counter()
    store.device_pool.ensure(frames[2:6])
    # fence: read one value
    float(store.device_pool.gray[0, 0, 0])
    up_ms = (time.perf_counter() - t0) / 4 * 1e3

    # warm P=1 calls
    out = {"pool_upload_ms_per_frame": round(up_ms, 1)}
    reps = 10
    t0 = time.perf_counter()
    for r in range(reps):
        store.raw.clear()  # force fresh
        corres.find_corres(store, [(frames[1], frames[0])], cfg, key=key)
    out["fused_call_P1_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 1)
    out["n_inliers_P1"] = int(store.matches[(1, 0)]["inlier"].sum())

    # P=16 bucket (6 distinct pairs padded to pair_batch=16)
    pairs = [(frames[i], frames[j]) for i in range(6) for j in range(i)][:8]
    t0 = time.perf_counter()
    store.raw.clear()
    corres.find_corres(store, pairs, cfg, key=key)
    print(f"P=16 compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for r in range(reps):
        store.raw.clear()
        corres.find_corres(store, pairs, cfg, key=key)
    out["fused_call_P16_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 1)
    out["inliers_pairs"] = [int(store.matches[(p[0].id, p[1].id)]["inlier"].sum())
                            for p in pairs]
    prof = {k: {"count": v["count"], "total_s": round(v["total_s"], 2)}
            for k, v in profiler.stats().items()}
    out["profile"] = prof
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
