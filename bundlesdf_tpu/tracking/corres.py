"""Pair preprocessing + correspondence management.

Mirrors the reference GluNet feature pipeline:
  * ``process_image_pair``   — FeatureManager.cpp:126-257 processImagePair:
    rotate B into A's in-plane camera orientation (from current pose
    estimates), crop both ROIs (+10 px margin), letterbox-scale to a square,
    returning the 3x3 pixel homographies tfA/tfB;
  * ``CorresStore``          — the `_raw_matches` / `_matches` tables
    (FeatureManager.h:164-170) as fixed-capacity numpy arrays per pair;
  * ``find_corres``          — the Python-driven loop bundlesdf.py:352-387:
    warp pairs, run the matcher batch, map matches back through inverse
    homographies, 3D-gate (rawMatchesToCorres FeatureManager.cpp:2720-2769),
    then multi-pair RANSAC (ops/ransac.py) in model frame;
  * ``procrustes_offset``    — FeatureManager.cpp:1050-1129
    procrustesByCorrespondence.

Image warping runs on host with OpenCV (as in the reference); matching and
RANSAC are single batched device launches.
"""
from __future__ import annotations

import math

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from ..config import Cfg
from ..models import matcher as matcher_mod
from ..ops import ransac as ransac_ops
from ..utils import se3
from ..utils.profiler import span
from .frame import Frame


def _rotate_image_transform(H: int, W: int, angle_rad: float) -> np.ndarray:
    """3x3 homography rotating an image by ``angle_rad`` about its center
    (reference Utils::getRotateImageTransform)."""
    c, s = math.cos(angle_rad), math.sin(angle_rad)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)
    T1 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], dtype=np.float64)
    T2 = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1]], dtype=np.float64)
    return T2 @ R @ T1


def in_plane_rotation(fa: Frame, fb: Frame) -> float:
    """Signed in-plane (camera-z) component of the relative rotation that
    maps B's camera orientation onto A's (reference
    FeatureManager.cpp:140-147)."""
    from scipy.spatial.transform import Rotation

    RA = fa.pose_in_model[:3, :3].T  # model -> camA
    RB = fb.pose_in_model[:3, :3].T
    R_BA = RA @ np.linalg.inv(RB)
    return float(Rotation.from_matrix(R_BA).as_rotvec()[2])


def pair_homographies(fa: Frame, fb: Frame, out_size: int):
    """The processImagePair homography math WITHOUT the warp: returns the
    3x3 full-res -> crop transforms (tfA, tfB).  Shared by the host cv2
    path (process_image_pair) and the fused device path, which warps on
    device from the resident frame pool (ops/fused_corres.py)."""
    H, W = fb.H, fb.W
    roiA, roiB = fa.roi, fb.roi
    margin = 10

    tfA = np.eye(3)
    tfB = _rotate_image_transform(H, W, in_plane_rotation(fa, fb))

    corners = np.array(
        [[roiB[0], roiB[2], 1], [roiB[0], roiB[3], 1],
         [roiB[1], roiB[2], 1], [roiB[1], roiB[3], 1]], dtype=np.float64
    )
    tc = (tfB @ corners.T).T
    umin, umax = tc[:, 0].min(), tc[:, 0].max()
    vmin, vmax = tc[:, 1].min(), tc[:, 1].max()

    tA = np.eye(3); tA[0, 2] = -roiA[0] + margin; tA[1, 2] = -roiA[2] + margin
    tfA = tA @ tfA
    tB = np.eye(3); tB[0, 2] = -umin + margin; tB[1, 2] = -vmin + margin
    tfB = tB @ tfB

    WA = roiA[1] - roiA[0] + margin * 2
    HA = roiA[3] - roiA[2] + margin * 2
    WB = umax - umin + margin * 2
    HB = vmax - vmin + margin * 2
    max_dim = max(WA, HA, WB, HB)
    sA = np.eye(3); sA[:2, :2] *= max_dim / max(WA, HA)
    tfA = sA @ tfA
    sB = np.eye(3); sB[:2, :2] *= max_dim / max(WB, HB)
    tfB = sB @ tfB
    sO = np.eye(3); sO[:2, :2] *= out_size / max_dim
    tfA = sO @ tfA
    tfB = sO @ tfB
    return tfA, tfB


def process_image_pair(fa: Frame, fb: Frame, out_size: int):
    """Returns (warped_gray_A, warped_gray_B, tfA, tfB)."""
    tfA, tfB = pair_homographies(fa, fb, out_size)
    outA = cv2.warpPerspective(fa.gray.astype(np.float32), tfA, (out_size, out_size))
    outB = cv2.warpPerspective(fb.gray.astype(np.float32), tfB, (out_size, out_size))
    return outA, outB, tfA, tfB


def _apply_homography(tf: np.ndarray, uv: np.ndarray) -> np.ndarray:
    h = np.concatenate([uv, np.ones((len(uv), 1))], axis=-1) @ tf.T
    return h[:, :2] / np.maximum(h[:, 2:3], 1e-12)


def make_matcher(cfg: Cfg):
    """Build the configured matching engine (reference FeatureManager class
    tree: SiftManager base / GluNet=LoFTR / Lfnet=remote server,
    FeatureManager.h:98-213).  Returns an object with the standard
    ``predict(grayAs, grayBs) -> ((B, K, 5), (B, K) valid)`` contract, or
    None for the built-in jitted corner matcher."""
    fc = cfg["feature_corres"]
    name = str(fc.get("matcher", "corner"))
    if name == "corner":
        return None
    if name == "sift":
        from ..models.matcher import SiftMatcher

        return SiftMatcher(max_matches=int(fc["max_matches_per_pair"]))
    if name == "loftr":
        from ..models import loftr_jax

        lcfg = loftr_jax.LoftrCfg(
            max_matches=int(fc["max_matches_per_pair"])
        )
        ckpt = str(fc.get("loftr_ckpt", "") or "")
        if ckpt:
            return loftr_jax.load_checkpoint(ckpt, lcfg)
        return loftr_jax.LoftrMatcher(lcfg)
    if name == "remote":
        from ..io.remote_matcher import RemoteMatcher

        return RemoteMatcher(int(fc.get("remote_port", 5555)))
    raise ValueError(f"unknown feature_corres.matcher: {name!r}")


class CorresStore:
    """Per-pair correspondence tables (the reference `_matches` /
    `_raw_matches` maps), keyed by (idA, idB) with idA the newer frame."""

    def __init__(self, cfg: Cfg):
        self.cfg = cfg
        self.max_matches = int(cfg["feature_corres"]["max_matches_per_pair"])
        self.raw: dict[tuple, np.ndarray] = {}
        self.matches: dict[tuple, dict] = {}
        self.tracks = FeatureTracks()
        # configured matching engine (None = built-in corner matcher)
        self.matcher = make_matcher(cfg)
        # device-resident frame pool for the fused one-launch path (created
        # lazily at the first find_corres; corner engine only)
        self.device_pool = None
        self._fused_enabled = bool(cfg["feature_corres"].get("fused", True))

    @property
    def use_fused(self):
        # dynamic: engines can be swapped in after construction (tests,
        # remote serving); the fused path only covers the built-in matcher
        return self._fused_enabled and self.matcher is None

    def _ensure_pool(self, frame):
        if self.device_pool is None:
            from .device_pool import DeviceFramePool

            self.device_pool = DeviceFramePool(
                frame.H, frame.W,
                capacity=int(self.cfg["feature_corres"].get(
                    "device_pool_slots", 64)),
            )
            self.device_pool.K = jnp.asarray(frame.K)
        return self.device_pool

    def forget_frame(self, fid: int):
        """Erase all matches touching a frame (reference forgetFrame ->
        FeatureManager erase, Bundler.cpp:62-73)."""
        for table in (self.raw, self.matches):
            for k in [k for k in table if fid in k]:
                del table[k]
        self.tracks.forget_frame(fid)
        if self.device_pool is not None:
            self.device_pool.release(fid)

    def invalidate_matches(self, fid: int):
        """Erase only the gated matches touching a frame, KEEPING the raw
        match table: the reference's NeRF-feedback invalidation
        (bundlesdf.py:607-617) deletes `_matches` so poses re-derive, but
        `_raw_matches` survives (FeatureManager.h:164-170) and the next
        find_corres re-gates them without re-running the network
        (rawMatchesToCorres, FeatureManager.cpp:2720-2769)."""
        for k in [k for k in self.matches if fid in k]:
            del self.matches[k]

    def n_inliers(self, key: tuple) -> int:
        m = self.matches.get(key)
        return 0 if m is None else int(m["inlier"].sum())


def gate_matches_3d(
    fa: Frame, fb: Frame, uvA: np.ndarray, uvB: np.ndarray, max_matches: int
) -> dict:
    """Pixel-bounds + depth-validity gating; build camera-frame 3D
    correspondences (reference rawMatchesToCorres / makeCorrespondence —
    distance/normal gates are disabled in the GluNet path)."""
    uvA = np.round(uvA).astype(np.int64)
    uvB = np.round(uvB).astype(np.int64)
    n = min(len(uvA), max_matches)
    uvA, uvB = uvA[:n], uvB[:n]
    out = {
        "uvA": np.zeros((max_matches, 2), np.int32),
        "uvB": np.zeros((max_matches, 2), np.int32),
        "pA": np.zeros((max_matches, 3), np.float32),
        "pB": np.zeros((max_matches, 3), np.float32),
        "nA": np.zeros((max_matches, 3), np.float32),
        "nB": np.zeros((max_matches, 3), np.float32),
        "valid": np.zeros(max_matches, bool),
        "inlier": np.zeros(max_matches, bool),
    }
    if n == 0:
        return out
    inb = (
        (uvA[:, 0] >= 0) & (uvA[:, 0] < fa.W) & (uvA[:, 1] >= 0) & (uvA[:, 1] < fa.H)
        & (uvB[:, 0] >= 0) & (uvB[:, 0] < fb.W) & (uvB[:, 1] >= 0) & (uvB[:, 1] < fb.H)
    )
    uvA_c = np.clip(uvA, 0, [fa.W - 1, fa.H - 1])
    uvB_c = np.clip(uvB, 0, [fb.W - 1, fb.H - 1])
    zA = fa.depth[uvA_c[:, 1], uvA_c[:, 0]]
    zB = fb.depth[uvB_c[:, 1], uvB_c[:, 0]]
    ok = inb & (zA > 0.1) & (zB > 0.1)
    out["uvA"][:n] = uvA_c
    out["uvB"][:n] = uvB_c
    out["pA"][:n] = fa.xyz[uvA_c[:, 1], uvA_c[:, 0]]
    out["pB"][:n] = fb.xyz[uvB_c[:, 1], uvB_c[:, 0]]
    out["nA"][:n] = fa.normals[uvA_c[:, 1], uvA_c[:, 0]]
    out["nB"][:n] = fb.normals[uvB_c[:, 1], uvB_c[:, 0]]
    out["valid"][:n] = ok
    return out


def find_corres(
    store: CorresStore,
    pairs: list[tuple[Frame, Frame]],
    cfg: Cfg,
    matcher_cfg: matcher_mod.CornerMatcherCfg | None = None,
    key: jax.Array | None = None,
    matcher_fn=None,
):
    """Full correspondence pipeline for a list of (new, old) frame pairs.

    Populates store.matches[(idA, idB)] with gated + RANSAC-filtered
    correspondences.  Mirrors BundleSdf.find_corres (bundlesdf.py:352-387):
    warp -> batched match -> unwarp -> 3D gate -> multi-pair RANSAC.
    """
    if not pairs:
        return
    fc = cfg["feature_corres"]
    out_size = int(fc["resize"])
    if matcher_cfg is None:
        matcher_cfg = matcher_mod.CornerMatcherCfg(max_matches=store.max_matches)
    if key is None:
        key = jax.random.PRNGKey(0)

    # Raw-match reuse (rawMatchesToCorres, FeatureManager.cpp:2720-2769):
    # pairs whose raw table survived a match invalidation (NeRF pose
    # feedback) re-derive correspondences by re-gating + re-RANSACing the
    # stored pixel matches under the updated poses — the matcher network
    # does NOT re-run for them.
    fresh_idx = [i for i, (fa, fb) in enumerate(pairs)
                 if (fa.id, fb.id) not in store.raw]

    if store.use_fused and matcher_fn is None:
        # One-launch device path (ops/fused_corres.py): frames resident in
        # the device pool, warp+match+gate+RANSAC fused, single readback.
        fresh_set = set(fresh_idx)
        fresh_pairs = [pairs[i] for i in fresh_idx]
        reused = [p for i, p in enumerate(pairs) if i not in fresh_set]
        if fresh_pairs:
            _find_corres_fused(store, fresh_pairs, cfg, matcher_cfg, key)
        if reused:
            # raw-reuse path stays host-gated (the matcher must NOT re-run)
            _find_corres_legacy(store, reused, cfg, matcher_cfg, key, None, [])
        return
    _find_corres_legacy(store, pairs, cfg, matcher_cfg, key, matcher_fn,
                        fresh_idx)


def make_fused_cfg(store, cfg, matcher_cfg):
    """FusedCorresCfg from the tracker config (shared by the standalone
    fused corres path and the fused match+BA path)."""
    from ..ops import fused_corres as fused_ops

    fc = cfg["feature_corres"]
    rcfg = cfg["ransac"]
    params = ransac_ops.RansacParams(
        n_trials=int(rcfg["max_iter"]),
        inlier_dist=float(rcfg["inlier_dist"]),
        inlier_normal_angle_deg=float(rcfg["inlier_normal_angle"]),
        min_match_after_ransac=int(rcfg["min_match_after_ransac"]),
    )
    return fused_ops.FusedCorresCfg(
        out_size=int(fc["resize"]), n_extra=int(fc.get("n_extra_prop", 128)),
        matcher=matcher_cfg, ransac=params,
    )


def ensure_pool_frames(store, frames):
    """Upload any non-resident frames to the device pool; returns slot map."""
    pool = store._ensure_pool(frames[0])
    with span("corres/pool_upload"):
        pool.ensure(frames)
        return pool, {f.id: pool.slot_of[f.id] for f in frames}


def build_pairs_data(store, pairs, cfg, slot_of):
    """Per-pair host metadata for the fused device paths: homographies,
    poses, RANSAC caps, track-propagation candidates."""
    fc = cfg["feature_corres"]
    rcfg = cfg["ransac"]
    out_size = int(fc["resize"])
    pairs_data = []
    with span("corres/warp"):
        for fa, fb in pairs:
            tfA, tfB = pair_homographies(fa, fb, out_size)
            pA_uv, pB_uv = store.tracks.propagate(fa.id, fb.id)
            extra = (np.concatenate([pA_uv, pB_uv], axis=-1)
                     if len(pA_uv) else np.zeros((0, 4)))
            neighbor = abs(fa.id - fb.id) == 1
            pairs_data.append({
                "slotA": slot_of[fa.id], "slotB": slot_of[fb.id],
                "valid": True,
                "tfA_inv": np.linalg.inv(tfA), "tfB_inv": np.linalg.inv(tfB),
                "poseA": fa.pose_in_model, "poseB": fb.pose_in_model,
                "extra_uv": extra,
                "max_trans": float(rcfg["max_trans_neighbor"] if neighbor
                                   else rcfg["max_trans_no_neighbor"]),
                "max_rot_deg": float(rcfg["max_rot_deg_neighbor"] if neighbor
                                     else rcfg["max_rot_no_neighbor"]),
            })
    return pairs_data


def commit_fused_results(store, pairs, res):
    """Write a fused program's unpacked match results into the host tables
    (store.raw / store.matches / feature tracks) — identical bookkeeping
    for the standalone corres program and the fused match+BA program."""
    for i, (fa, fb) in enumerate(pairs):
        row_valid = res["row_valid"][i]
        uvA_f = res["uvA"][i]
        uvB_f = res["uvB"][i]
        nv = int(row_valid.sum())
        # raw table (float uv, matcher-then-propagated order — same layout
        # as the legacy path's store.raw)
        store.raw[(fa.id, fb.id)] = np.concatenate(
            [uvA_f[:nv], uvB_f[:nv]], axis=-1).astype(np.float32)
        # gated match table (host maps for pA/nA — the device decided
        # validity/inliers from its quantized pool; host stores its own
        # full-precision values for BA/procrustes)
        uvAc = np.clip(np.round(uvA_f).astype(np.int64), 0,
                       [fa.W - 1, fa.H - 1])
        uvBc = np.clip(np.round(uvB_f).astype(np.int64), 0,
                       [fb.W - 1, fb.H - 1])
        g = {
            "uvA": np.where(row_valid[:, None], uvAc, 0).astype(np.int32),
            "uvB": np.where(row_valid[:, None], uvBc, 0).astype(np.int32),
            "pA": np.where(row_valid[:, None],
                           fa.xyz[uvAc[:, 1], uvAc[:, 0]], 0.0
                           ).astype(np.float32),
            "pB": np.where(row_valid[:, None],
                           fb.xyz[uvBc[:, 1], uvBc[:, 0]], 0.0
                           ).astype(np.float32),
            "nA": np.where(row_valid[:, None],
                           fa.normals[uvAc[:, 1], uvAc[:, 0]], 0.0
                           ).astype(np.float32),
            "nB": np.where(row_valid[:, None],
                           fb.normals[uvBc[:, 1], uvBc[:, 0]], 0.0
                           ).astype(np.float32),
            "valid": res["gate_valid"][i],
            "inlier": res["inlier"][i] & res["gate_valid"][i],
        }
        store.matches[(fa.id, fb.id)] = g
        store.tracks.add_matches(fa.id, fb.id, g["uvA"], g["uvB"], g["inlier"])


def _find_corres_fused(store, pairs, cfg, matcher_cfg, key):
    """Fused device path for fresh pairs (see ops/fused_corres.py)."""
    from ..ops import fused_corres as fused_ops

    fc = cfg["feature_corres"]
    M = store.max_matches
    all_frames, seen = [], set()
    for fa, fb in pairs:
        for f in (fa, fb):
            if f.id not in seen:
                seen.add(f.id)
                all_frames.append(f)
    pool, slot_of = ensure_pool_frames(store, all_frames)
    fcfg = make_fused_cfg(store, cfg, matcher_cfg)
    pairs_data = build_pairs_data(store, pairs, cfg, slot_of)

    # batch-size bucketing {1, pair_batch/2, pair_batch, pow2} — one
    # compiled program per bucket (see the legacy path's rationale).  The
    # half bucket exists because BA match batches are usually <=
    # max_BA_frames-1 = 9 pairs: padding them to 16 doubles the dominant
    # warp-gather work per call (~190 ms at the r4 gather rate).
    n = len(pairs_data)
    fixed = int(fc.get("pair_batch", 16))
    half = fixed // 2
    if n == 1:
        P = 1
    elif half >= 2 and n <= half:
        P = half
    elif n <= fixed:
        P = fixed
    else:
        P = 1 << max(0, (n - 1).bit_length())
    pad = dict(pairs_data[0])
    pad["valid"] = False
    pairs_data += [pad] * (P - n)

    packed = fused_ops.pack_call(pairs_data, fcfg.n_extra)
    with span("corres/match"):
        from ..utils import profiler

        profiler.count("launch/corres")
        profiler.count("readback/corres")
        buf = fused_ops.fused_find_corres_packed(
            pool.gray, pool.depth, pool.normals, pool.K,
            packed, key, fcfg,
        )
        res = fused_ops.unpack_result(buf, M)
    commit_fused_results(store, pairs, res)


def _find_corres_legacy(store, pairs, cfg, matcher_cfg, key, matcher_fn,
                        fresh_idx):
    fc = cfg["feature_corres"]
    out_size = int(fc["resize"])

    imgsA, imgsB = [], []
    tfsA = [None] * len(pairs)
    tfsB = [None] * len(pairs)
    with span("corres/warp"):
        for i in fresh_idx:
            fa, fb = pairs[i]
            a, b, ta, tb = process_image_pair(fa, fb, out_size)
            imgsA.append(a); imgsB.append(b); tfsA[i] = ta; tfsB[i] = tb

    corres_b = valid_b = None
    if fresh_idx:
        # Pad the pair batch to one of TWO fixed sizes, {1, pair_batch}:
        # the per-frame pair count is data-dependent and every distinct
        # batch size triggers a fresh XLA compile of the matcher — each a
        # ~30-60 s remote compile on the tunneled TPU.  The per-frame
        # reference match is always a SINGLE pair (find_corres_ref), so a
        # dedicated batch-of-1 program pays one extra compile but stops
        # burning pair_batch x matcher FLOPs on every frame (~40% of the
        # round-2 warm frame time).  Oversized batches (rare) fall back to
        # the next power of two.  Padded slots repeat pair 0 and are
        # discarded below.  HOST engines (SIFT / remote server) never
        # compile — they run exactly n_fresh pairs, unpadded.
        n_fresh = len(fresh_idx)
        fixed = int(fc.get("pair_batch", 16))
        engine = store.matcher if matcher_fn is None else None
        host_engine = (matcher_fn is None and engine is not None
                       and not getattr(engine, "compiled", True))
        if host_engine:
            n_pad = n_fresh
        elif n_fresh == 1:
            n_pad = 1
        elif n_fresh <= fixed:
            n_pad = fixed
        else:
            n_pad = 1 << max(0, (n_fresh - 1).bit_length())
        for _ in range(n_pad - n_fresh):
            imgsA.append(imgsA[0]); imgsB.append(imgsB[0])

        with span("corres/match"):
            from ..utils import profiler

            profiler.count("launch/corres")
            profiler.count("readback/corres")
            if matcher_fn is None and store.matcher is not None:
                matcher_fn = store.matcher.predict
            if matcher_fn is None:
                res = matcher_mod.match_pairs_batched(
                    jnp.asarray(np.stack(imgsA)), jnp.asarray(np.stack(imgsB)),
                    matcher_cfg
                )
                corres_b = np.asarray(res["corres"])[:n_fresh]
                valid_b = np.asarray(res["valid"])[:n_fresh]
            else:
                corres_b, valid_b = matcher_fn(np.stack(imgsA), np.stack(imgsB))
                corres_b, valid_b = corres_b[:n_fresh], valid_b[:n_fresh]

    rcfg = cfg["ransac"]
    params = ransac_ops.RansacParams(
        n_trials=int(rcfg["max_iter"]),
        inlier_dist=float(rcfg["inlier_dist"]),
        inlier_normal_angle_deg=float(rcfg["inlier_normal_angle"]),
        min_match_after_ransac=int(rcfg["min_match_after_ransac"]),
    )

    gated = []
    fresh_pos = {pi: bi for bi, pi in enumerate(fresh_idx)}
    for i, (fa, fb) in enumerate(pairs):
        if i in fresh_pos:
            bi = fresh_pos[i]
            sel = valid_b[bi]
            cc = corres_b[bi][sel]
            uvA = _apply_homography(np.linalg.inv(tfsA[i]), cc[:, 0:2])
            uvB = _apply_homography(np.linalg.inv(tfsB[i]), cc[:, 2:4])
            # Track propagation (reference MapPoint propagation,
            # FeatureManager.cpp runRansacBetween prioritizes propagated
            # matches): pixels linked to both frames through shared
            # multi-frame tracks join the RANSAC candidate set.
            pA, pB = store.tracks.propagate(fa.id, fb.id)
            if len(pA):
                uvA = np.concatenate([uvA, pA])
                uvB = np.concatenate([uvB, pB])
            store.raw[(fa.id, fb.id)] = np.concatenate(
                [uvA, uvB], axis=-1
            ).astype(np.float32)[: store.max_matches]
        else:
            raw = store.raw[(fa.id, fb.id)]
            uvA, uvB = raw[:, 0:2].astype(np.float64), raw[:, 2:4].astype(np.float64)
        g = gate_matches_3d(fa, fb, uvA, uvB, store.max_matches)
        gated.append(g)

    # Model-frame points for RANSAC (reference runRansacMultiPairGPU host
    # glue transforms matches by the current poses).  Padding over ALL
    # pairs (fresh + raw-reused; padded slots are all-invalid) to one of
    # TWO bucket sizes {1, pair_batch} — two compiled RANSAC programs per
    # run, and the per-frame single-pair reference RANSAC stops paying
    # pair_batch x trials x points of wasted work (see pair_batch above).
    fixed = int(fc.get("pair_batch", 16))
    if len(pairs) == 1:
        P = 1
    elif len(pairs) <= fixed:
        P = fixed
    else:
        P = 1 << max(0, (len(pairs) - 1).bit_length())
    M = store.max_matches
    ptsA = np.zeros((P, M, 3), np.float32)
    ptsB = np.zeros((P, M, 3), np.float32)
    nA = np.zeros((P, M, 3), np.float32)
    nB = np.zeros((P, M, 3), np.float32)
    valid = np.zeros((P, M), bool)
    max_trans = np.zeros(P, np.float32)
    max_rot = np.zeros(P, np.float32)
    for i, (fa, fb) in enumerate(pairs):
        g = gated[i]
        Ta, Tb = fa.pose_in_model, fb.pose_in_model
        ptsA[i] = g["pA"] @ Ta[:3, :3].T + Ta[:3, 3]
        ptsB[i] = g["pB"] @ Tb[:3, :3].T + Tb[:3, 3]
        nA[i] = g["nA"] @ Ta[:3, :3].T
        nB[i] = g["nB"] @ Tb[:3, :3].T
        valid[i] = g["valid"]
        neighbor = abs(fa.id - fb.id) == 1
        max_trans[i] = float(rcfg["max_trans_neighbor"] if neighbor else rcfg["max_trans_no_neighbor"])
        max_rot[i] = float(rcfg["max_rot_deg_neighbor"] if neighbor else rcfg["max_rot_no_neighbor"])

    with span("corres/ransac"):
        from ..utils import profiler

        profiler.count("launch/ransac")
        profiler.count("readback/ransac")
        res = ransac_ops.ransac_multi_pair(
            key, jnp.asarray(ptsA), jnp.asarray(ptsB), jnp.asarray(nA), jnp.asarray(nB),
            jnp.asarray(valid), params, jnp.asarray(max_trans), jnp.asarray(max_rot),
        )
        inliers = np.asarray(res["inliers"])
    for i, (fa, fb) in enumerate(pairs):
        g = gated[i]
        g["inlier"] = inliers[i] & g["valid"]
        store.matches[(fa.id, fb.id)] = g
        # merge inliers into multi-frame feature tracks (map points)
        store.tracks.add_matches(fa.id, fb.id, g["uvA"], g["uvB"], g["inlier"])


def procrustes_offset(store: CorresStore, fa: Frame, fb: Frame) -> np.ndarray:
    """Pose increment from the inlier correspondences of (fa, fb):
    ``pose_a <- offset @ pose_a`` (reference procrustesByCorrespondence)."""
    m = store.matches.get((fa.id, fb.id))
    if m is None or m["inlier"].sum() < 3:
        return np.eye(4, dtype=np.float32)
    Ta, Tb = fa.pose_in_model, fb.pose_in_model
    src = m["pA"] @ Ta[:3, :3].T + Ta[:3, 3]
    dst = m["pB"] @ Tb[:3, :3].T + Tb[:3, 3]
    # Host SVD: <=512 points — a device RTT would dominate the solve.
    w = m["inlier"].astype(np.float64)
    wsum = w.sum()
    mu_s = (src * w[:, None]).sum(0) / wsum
    mu_d = (dst * w[:, None]).sum(0) / wsum
    S = ((dst - mu_d) * w[:, None]).T @ (src - mu_s)
    U, _, Vt = np.linalg.svd(S)
    d = np.sign(np.linalg.det(U @ Vt))
    R = U @ np.diag([1.0, 1.0, d]) @ Vt
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = mu_d - R @ mu_s
    return T


# ----------------------------------------------------------- map points
class FeatureTracks:
    """Multi-frame feature tracks (the reference MapPoint table,
    FeatureManager.h:49-66, `_map_points`): inlier correspondences merge
    into tracks via union-find over quantized (frame, u, v) keypoints.

    Used for covisible-point counting in BA subset selection
    (getCovisibleMapPoints, Bundler.cpp:555-580) and match propagation:
    two frames that both match a third share a track -> candidate
    correspondence without re-running the matcher.
    """

    def __init__(self, quant: int = 2):
        self.quant = quant
        self._parent: dict[tuple, tuple] = {}
        # per ordered frame pair: observation key lists (for propagation)
        self._frame_keys: dict[int, set] = {}

    def _key(self, fid: int, u: float, v: float) -> tuple:
        q = self.quant
        return (fid, int(round(u / q)), int(round(v / q)))

    def _find(self, k):
        p = self._parent.setdefault(k, k)
        while p != self._parent[p]:
            self._parent[p] = self._parent[self._parent[p]]
            p = self._parent[p]
        self._parent[k] = p
        return p

    def _union(self, a, b):
        ra, rb = self._find(a), self._find(b)
        if ra != rb:
            self._parent[rb] = ra

    def add_matches(self, fa_id: int, fb_id: int, uvA: np.ndarray,
                    uvB: np.ndarray, inlier: np.ndarray):
        for i in np.nonzero(inlier)[0]:
            ka = self._key(fa_id, uvA[i, 0], uvA[i, 1])
            kb = self._key(fb_id, uvB[i, 0], uvB[i, 1])
            self._union(ka, kb)
            self._frame_keys.setdefault(fa_id, set()).add(ka)
            self._frame_keys.setdefault(fb_id, set()).add(kb)

    def forget_frame(self, fid: int):
        self._frame_keys.pop(fid, None)
        # Union-find entries of dead frames are lazily kept (stale roots
        # are harmless for correctness) but must not grow without bound
        # over a long video: compact when the table exceeds 2x the live
        # key count (amortized O(1) per forget).
        n_live = sum(len(ks) for ks in self._frame_keys.values())
        if len(self._parent) > max(1024, 2 * n_live):
            self.compact()

    def compact(self):
        """Rebuild the union-find over only the LIVE keys (keys of frames
        still present), preserving connectivity between them.  Dead keys on
        parent chains are dropped; each component keeps one live
        representative.  Bounds memory for 1000+-frame videos (the
        reference erases matches per forgotten frame,
        FeatureManager.cpp:467-512 — map points of dead frames die too)."""
        live = set()
        for ks in self._frame_keys.values():
            live |= ks
        root_rep: dict[tuple, tuple] = {}
        new_parent: dict[tuple, tuple] = {}
        for k in live:
            r = self._find(k)
            rep = root_rep.setdefault(r, k)
            new_parent[k] = rep
        for rep in root_rep.values():
            new_parent[rep] = rep
        self._parent = new_parent

    def n_covisible(self, fa_id: int, fb_id: int) -> int:
        """Number of shared tracks between two frames."""
        ka = self._frame_keys.get(fa_id, ())
        kb = self._frame_keys.get(fb_id, ())
        if not ka or not kb:
            return 0
        roots_b = {self._find(k) for k in kb}
        return sum(1 for k in ka if self._find(k) in roots_b)

    def propagate(self, fa_id: int, fb_id: int):
        """Candidate (uvA, uvB) pixel pairs linked through shared tracks."""
        ka = self._frame_keys.get(fa_id, ())
        kb = self._frame_keys.get(fb_id, ())
        if not ka or not kb:
            return np.zeros((0, 2)), np.zeros((0, 2))
        by_root: dict[tuple, tuple] = {}
        for k in kb:
            by_root.setdefault(self._find(k), k)
        uvA, uvB = [], []
        q = self.quant
        for k in ka:
            other = by_root.get(self._find(k))
            if other is not None:
                uvA.append((k[1] * q, k[2] * q))
                uvB.append((other[1] * q, other[2] * q))
        return np.asarray(uvA, np.float64), np.asarray(uvB, np.float64)
