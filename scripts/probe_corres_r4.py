#!/usr/bin/env python
"""Round-4 probe: where does the 1.9 s/call matching path go? (VERDICT r3 #1)

Times each phase inside one find_corres call on the REAL chip, the way
bisect_step.py did for the NOF step:

  warp      host cv2 warpPerspective of the pair crops
  h2d       jnp.asarray of the stacked crop batch (+ sum-fence)
  match     matcher launch + full result readback (warm program)
  gate      host 3D gating (depth/xyz lookups)
  prep      RANSAC array assembly on host
  ransac    RANSAC upload + launch + inlier readback (warm program)

plus tunnel characteristics: dispatch RTT, H2D BW, D2H BW.

Usage: python scripts/probe_corres_r4.py [--pairs 1] [--reps 8]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def fence(x):
    """Execution fence: float readback (block_until_ready is not a barrier
    on the axon backend — memory note)."""
    import jax.numpy as jnp
    return float(jnp.sum(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=1)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from synthetic_hard import render_blob_rgbd
    from scipy.spatial.transform import Rotation
    from bundlesdf_tpu.config import ycbineoat_track_config
    from bundlesdf_tpu.tracking.frame import Frame
    from bundlesdf_tpu.tracking import corres
    from bundlesdf_tpu.models import matcher as matcher_mod
    from bundlesdf_tpu.ops import ransac as ransac_ops

    print(f"devices: {jax.devices()}", flush=True)
    dev = jax.devices()[0]

    out = {"backend": str(dev.platform), "pairs": args.pairs}

    # ---------------- tunnel characteristics
    one = jnp.ones((8, 128), jnp.float32)
    fence(one + 1.0)
    t0 = time.perf_counter()
    for _ in range(10):
        fence(one + 1.0)
    out["rtt_dispatch_ms"] = (time.perf_counter() - t0) / 10 * 1e3

    big = np.random.rand(16, 400, 400).astype(np.float32)  # 10.24 MB
    nbytes = big.nbytes
    jx = jnp.asarray(big); fence(jx)
    t0 = time.perf_counter()
    for _ in range(4):
        big += 1.0  # defeat any host-side caching by content
        jx = jnp.asarray(big)
        fence(jx[:, :1, :1])  # tiny readback after full transfer
    dt = (time.perf_counter() - t0) / 4
    out["h2d_MBps"] = nbytes / dt / 1e6
    out["h2d_10MB_ms"] = dt * 1e3

    jy = jnp.zeros((16, 400, 400), jnp.float32) + 1.0
    fence(jy)
    np.asarray(jy)
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(jy + float(np.random.rand()))  # new buffer each time
    dt = (time.perf_counter() - t0) / 4
    out["d2h_MBps"] = nbytes / dt / 1e6
    out["d2h_10MB_ms"] = dt * 1e3

    # uint8 h2d
    big8 = (np.random.rand(16, 400, 400) * 255).astype(np.uint8)
    j8 = jnp.asarray(big8); fence(j8.astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(4):
        big8 += 1
        j8 = jnp.asarray(big8)
        fence(j8[:, :1, :1].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / 4
    out["h2d_u8_MBps"] = big8.nbytes / dt / 1e6

    print(json.dumps(out), flush=True)

    # ---------------- build two frames from the hard fixture
    cfg = ycbineoat_track_config()
    cfg["depth_processing"]["zfar"] = 1.0
    H = W = 480
    K = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
    frames = []
    for k in range(2):
        R = Rotation.from_rotvec(np.array([0, 1, 0.2]) / np.linalg.norm([0, 1, 0.2])
                                 * np.deg2rad(7.0 * k)).as_matrix()
        T = np.eye(4); T[:3, :3] = R; T[:3, 3] = [0, 0, 0.55]
        rgb, depth, mask = render_blob_rgbd(T, K, H, W)
        f = Frame(rgb, depth, K, id=k, id_str=f"{k:05d}", cfg=cfg,
                  fg_mask=mask > 0)
        f.pose_in_model = np.linalg.inv(T).astype(np.float32)
        frames.append(f)
    fa, fb = frames[1], frames[0]

    fc = cfg["feature_corres"]
    out_size = int(fc["resize"])
    mcfg = matcher_mod.CornerMatcherCfg(max_matches=int(fc["max_matches_per_pair"]))
    rcfg = cfg["ransac"]
    params = ransac_ops.RansacParams(
        n_trials=int(rcfg["max_iter"]),
        inlier_dist=float(rcfg["inlier_dist"]),
        inlier_normal_angle_deg=float(rcfg["inlier_normal_angle"]),
        min_match_after_ransac=int(rcfg["min_match_after_ransac"]),
    )
    key = jax.random.PRNGKey(0)
    P = args.pairs
    M = int(fc["max_matches_per_pair"])

    # warmup compiles (match + ransac at this batch size)
    a, b, ta, tb = corres.process_image_pair(fa, fb, out_size)
    A = jnp.asarray(np.stack([a] * P)); B = jnp.asarray(np.stack([b] * P))
    t0 = time.perf_counter()
    res = matcher_mod.match_pairs_batched(A, B, mcfg)
    np.asarray(res["corres"])
    print(f"match compile+run: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    rres = ransac_ops.ransac_multi_pair(
        key, jnp.zeros((P, M, 3), jnp.float32), jnp.zeros((P, M, 3), jnp.float32),
        jnp.zeros((P, M, 3), jnp.float32), jnp.zeros((P, M, 3), jnp.float32),
        jnp.zeros((P, M), bool), params,
        jnp.ones(P, jnp.float32), jnp.ones(P, jnp.float32) * 60)
    np.asarray(rres["inliers"])
    print(f"ransac compile+run: {time.perf_counter()-t0:.2f}s", flush=True)

    # ---------------- phase timing (warm)
    ph = {k: 0.0 for k in ["warp", "h2d", "match", "readback", "gate", "prep",
                           "ransac"]}
    for rep in range(args.reps):
        t0 = time.perf_counter()
        imgsA, imgsB = [], []
        for _ in range(P):
            a, b, ta, tb = corres.process_image_pair(fa, fb, out_size)
            imgsA.append(a); imgsB.append(b)
        t1 = time.perf_counter(); ph["warp"] += t1 - t0

        A = jnp.asarray(np.stack(imgsA)); B = jnp.asarray(np.stack(imgsB))
        fence(A[:, :1, :1]); fence(B[:, :1, :1])
        t2 = time.perf_counter(); ph["h2d"] += t2 - t1

        res = matcher_mod.match_pairs_batched(A, B, mcfg)
        corres_b = np.asarray(res["corres"])
        valid_b = np.asarray(res["valid"])
        t3 = time.perf_counter(); ph["match"] += t3 - t2

        gated = []
        for i in range(P):
            sel = valid_b[i]
            cc = corres_b[i][sel]
            uvA = corres._apply_homography(np.linalg.inv(ta), cc[:, 0:2])
            uvB = corres._apply_homography(np.linalg.inv(tb), cc[:, 2:4])
            g = corres.gate_matches_3d(fa, fb, uvA, uvB, M)
            gated.append(g)
        t4 = time.perf_counter(); ph["gate"] += t4 - t3

        ptsA = np.zeros((P, M, 3), np.float32); ptsB = np.zeros((P, M, 3), np.float32)
        nA = np.zeros((P, M, 3), np.float32); nB = np.zeros((P, M, 3), np.float32)
        valid = np.zeros((P, M), bool)
        for i in range(P):
            g = gated[i]
            Ta, Tb = fa.pose_in_model, fb.pose_in_model
            ptsA[i] = g["pA"] @ Ta[:3, :3].T + Ta[:3, 3]
            ptsB[i] = g["pB"] @ Tb[:3, :3].T + Tb[:3, 3]
            nA[i] = g["nA"] @ Ta[:3, :3].T
            nB[i] = g["nB"] @ Tb[:3, :3].T
            valid[i] = g["valid"]
        t5 = time.perf_counter(); ph["prep"] += t5 - t4

        rres = ransac_ops.ransac_multi_pair(
            key, jnp.asarray(ptsA), jnp.asarray(ptsB), jnp.asarray(nA),
            jnp.asarray(nB), jnp.asarray(valid), params,
            jnp.ones(P, jnp.float32), jnp.ones(P, jnp.float32) * 60)
        inl = np.asarray(rres["inliers"])
        t6 = time.perf_counter(); ph["ransac"] += t6 - t5

    n_inl = int((inl[0] & valid[0]).sum())
    out2 = {k: round(v / args.reps * 1e3, 1) for k, v in ph.items()}
    out2["total_ms"] = round(sum(ph.values()) / args.reps * 1e3, 1)
    out2["n_inliers"] = n_inl
    print(json.dumps(out2), flush=True)


if __name__ == "__main__":
    main()
