"""Standalone matcher-quality evaluation on a synthetic fixture.

Scores a matching engine (corner / sift / loftr[+ckpt]) the way the
tracking pipeline consumes it (reference quality backbone: pretrained
LoFTR, loftr_wrapper.py:29-82): frame pairs are warped/cropped with
``process_image_pair`` exactly as in find_corres, the engine predicts
matches in crop space, matches are unwarped to full-res pixels, and each
match is checked against the fixture's ground-truth geometry — frame A's
depth at uvA is lifted to 3D, moved by the GT relative pose, projected
into frame B, and compared to uvB.

Reports, per engine: matches/pair, inlier rate @3px / @5px, mean pixel
error of inliers.  This is the fast iteration signal for LoFTR training
(full-pipeline ADD AUC is the shipping metric, benchmark_synth.py).

Usage:
  python scripts/eval_matcher.py --video /tmp/synth_hard_r3/video \
      --matchers corner,sift,loftr --loftr_ckpt weights/loftr.npz \
      --gaps 1,2,4
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_frames(video_dir, ids, cfg):
    from bundlesdf_tpu.io.readers import YcbineoatReader
    from bundlesdf_tpu.tracking.frame import Frame

    reader = YcbineoatReader(video_dir)
    gts = np.load(os.path.join(video_dir, "gt_ob_in_cam.npy"))
    frames = {}
    for i in ids:
        color = reader.get_color(i)
        depth = reader.get_depth(i)
        mask = reader.get_mask(i) > 0
        pose_in_model = np.linalg.inv(gts[i])  # cam_in_ob
        f = Frame(color, depth, reader.K, i, f"{i:05d}", cfg,
                  pose_in_model=pose_in_model.astype(np.float32),
                  fg_mask=mask)
        frames[i] = f
    return frames, gts, reader.K


def gt_error_px(fa, fb, gtA, gtB, K, uvA, uvB):
    """Per-match reprojection error of uvA (frame A px) into frame B under
    the GT relative pose, vs the predicted uvB.  Matches landing on
    invalid depth are dropped (error = +inf)."""
    h, w = fa.depth.shape
    ui = np.clip(np.round(uvA[:, 0]).astype(int), 0, w - 1)
    vi = np.clip(np.round(uvA[:, 1]).astype(int), 0, h - 1)
    z = fa.depth[vi, ui]
    ok = z > 0.01
    x = (uvA[:, 0] - K[0, 2]) / K[0, 0] * z
    y = (uvA[:, 1] - K[1, 2]) / K[1, 1] * z
    pA = np.stack([x, y, z, np.ones_like(z)], -1)
    # GT: ob_in_camB @ cam A <- ob: pB = gtB @ inv(gtA) @ pA
    pB = (gtB @ np.linalg.inv(gtA) @ pA.T).T
    u = pB[:, 0] / pB[:, 2] * K[0, 0] + K[0, 2]
    v = pB[:, 1] / pB[:, 2] * K[1, 1] + K[1, 2]
    err = np.hypot(u - uvB[:, 0], v - uvB[:, 1])
    return np.where(ok, err, np.inf)


def run_matcher(name, pairs, cfg, loftr_ckpt=""):
    """Yield (uvA, uvB) full-res match arrays per pair, via the exact
    find_corres crop path (tracking/corres.py)."""
    import jax
    import jax.numpy as jnp
    from bundlesdf_tpu.tracking.corres import (
        process_image_pair, _apply_homography)
    from bundlesdf_tpu.models import matcher as matcher_mod

    out_size = int(cfg["feature_corres"]["resize"])
    crops = [process_image_pair(fa, fb, out_size) for fa, fb in pairs]
    imgsA = np.stack([c[0] for c in crops])
    imgsB = np.stack([c[1] for c in crops])

    if name == "corner":
        mcfg = matcher_mod.CornerMatcherCfg(
            max_matches=int(cfg["feature_corres"]["max_matches_per_pair"]))
        res = matcher_mod.match_pairs_batched(
            jnp.asarray(imgsA), jnp.asarray(imgsB), mcfg)
        corres_b = np.asarray(res["corres"])
        valid_b = np.asarray(res["valid"])
    else:
        cfg2 = {"feature_corres": dict(cfg["feature_corres"])}
        cfg2["feature_corres"]["matcher"] = name
        if loftr_ckpt:
            cfg2["feature_corres"]["loftr_ckpt"] = loftr_ckpt
        from bundlesdf_tpu.tracking.corres import make_matcher

        eng = make_matcher(cfg2)
        # chunk the batch: 24 pairs of 400^2 through the transformer in one
        # program is too big for the CPU-eval path (and one fixed chunk
        # shape = one compile on TPU)
        ck = 4
        n = len(imgsA)
        cbs, vbs = [], []
        for s in range(0, n, ck):
            a = imgsA[s:s + ck]
            b = imgsB[s:s + ck]
            pad = ck - len(a)
            if pad:
                a = np.concatenate([a, np.repeat(a[:1], pad, 0)])
                b = np.concatenate([b, np.repeat(b[:1], pad, 0)])
            cb, vb = eng.predict(a, b)
            cbs.append(np.asarray(cb)[:ck - pad])
            vbs.append(np.asarray(vb)[:ck - pad])
        corres_b = np.concatenate(cbs)
        valid_b = np.concatenate(vbs)

    out = []
    for i, (fa, fb) in enumerate(pairs):
        sel = np.asarray(valid_b[i])
        cc = np.asarray(corres_b[i])[sel]
        _, _, ta, tb = crops[i]
        uvA = _apply_homography(np.linalg.inv(ta), cc[:, 0:2])
        uvB = _apply_homography(np.linalg.inv(tb), cc[:, 2:4])
        out.append((uvA, uvB))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", default="/tmp/synth_hard_r3/video")
    ap.add_argument("--matchers", default="corner,sift")
    ap.add_argument("--loftr_ckpt", default="")
    ap.add_argument("--gaps", default="1,2,4")
    ap.add_argument("--max_pairs", type=int, default=24)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from bundlesdf_tpu.config import ycbineoat_track_config

    cfg = ycbineoat_track_config()
    ds_cfg = os.path.join(args.video, "track_config.yml")
    if os.path.exists(ds_cfg):
        import yaml

        with open(ds_cfg) as f:
            for k, v in (yaml.safe_load(f) or {}).items():
                if isinstance(v, dict) and k in cfg:
                    cfg[k].update(v)
                else:
                    cfg[k] = v

    gaps = [int(g) for g in args.gaps.split(",")]
    n = len(os.listdir(os.path.join(args.video, "rgb")))
    pair_ids = []
    for g in gaps:
        pair_ids += [(i + g, i) for i in range(0, n - g,
                                               max(1, (n - g) * len(gaps)
                                                   // args.max_pairs))]
    ids = sorted({i for p in pair_ids for i in p})
    frames, gts, K = build_frames(args.video, ids, cfg)
    pairs = [(frames[a], frames[b]) for a, b in pair_ids]

    report = {"video": args.video, "n_pairs": len(pairs), "gaps": gaps}
    for name in [m.strip() for m in args.matchers.split(",") if m.strip()]:
        matches = run_matcher(name, pairs, cfg, loftr_ckpt=args.loftr_ckpt)
        errs, counts = [], []
        for (uvA, uvB), (ia, ib) in zip(matches, pair_ids):
            e = gt_error_px(frames[ia], frames[ib], gts[ia], gts[ib], K,
                            uvA, uvB)
            errs.append(e)
            counts.append(len(e))
        e = np.concatenate(errs) if errs else np.array([])
        fin = e[np.isfinite(e)]
        r = {
            "matches_per_pair": round(float(np.mean(counts)), 1),
            "inlier_rate_3px": round(float((fin < 3).mean()), 4) if len(fin) else 0.0,
            "inlier_rate_5px": round(float((fin < 5).mean()), 4) if len(fin) else 0.0,
            "mean_err_inliers_px": (round(float(fin[fin < 5].mean()), 3)
                                    if (fin < 5).any() else None),
            "n_valid_depth": int(len(fin)),
        }
        report[name] = r
        print(name, json.dumps(r), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
