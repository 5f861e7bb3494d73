"""One-launch correspondence pipeline over a device-resident frame pool.

Round-3 profiling showed the matching path costing ~1.9 s/call on a
tunneled TPU — almost entirely transport: per-call upload of the warped
400^2 crop batch (~20 MB at ~15 MB/s), plus a dispatch round trip
(~35 ms) for each of {matcher, RANSAC} and the intermediate readback
between them.  The compute itself is single-digit milliseconds.

This module removes the transport: frames' gray/depth/normal maps live in
a fixed-capacity DEVICE pool (uploaded once per frame,
tracking/device_pool.py), and the whole per-call pipeline —

    warp crops (homography bilinear sampling)           [CUDAImageUtil-class]
  → Harris+ZNCC match           (models/matcher.py)     [LoFTR predict slot]
  → unwarp matches through the inverse homographies
  → merge host-provided track-propagation candidates
  → 3D gate (depth validity, camera-space points)       [rawMatchesToCorres]
  → model-frame transform + multi-pair RANSAC           [ransacMultiPairGPU]

— runs as ONE jitted XLA program with ONE packed readback.  Reference
anchors: BundleSdf.find_corres (bundlesdf.py:352-387) runs the same five
stages as separate host-driven steps; the reference likewise batches up to
64 pairs through one LoFTR forward (loftr_wrapper.py:43-45) but still pays
host round trips for warp/gate/RANSAC glue.

Output packing (single (P, K+3, 8) float32 readback):
  rows 0..K-1: [uA, vA, uB, vB, conf, match_valid, gate_valid, inlier]
               (uv in FULL-RES pixels, unrounded)
  row  K    : refit pose rows 0,1 (8 floats)
  row  K+1  : refit pose rows 2,3
  row  K+2  : [n_inliers, ok, n_matcher_valid, 0...]
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import matcher as matcher_mod
from ..utils import se3
from . import ransac as ransac_ops


class FusedCorresCfg(NamedTuple):
    out_size: int = 400
    n_extra: int = 128  # track-propagation candidate capacity per pair
    matcher: matcher_mod.CornerMatcherCfg = matcher_mod.CornerMatcherCfg()
    ransac: ransac_ops.RansacParams = ransac_ops.RansacParams()


def _warp_crop(img: jnp.ndarray, tf_inv: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Homography-warp a crop out of ``img``: out[v, u] = img(tf_inv @ [u,v,1])
    with bilinear sampling, zero outside (cv2.warpPerspective parity —
    reference processImagePair warps with the same convention,
    FeatureManager.cpp:126-257)."""
    H, W = img.shape
    S = out_size
    v = jax.lax.broadcasted_iota(jnp.float32, (S, S), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (S, S), 1)
    x = tf_inv[0, 0] * u + tf_inv[0, 1] * v + tf_inv[0, 2]
    y = tf_inv[1, 0] * u + tf_inv[1, 1] * v + tf_inv[1, 2]
    w = tf_inv[2, 0] * u + tf_inv[2, 1] * v + tf_inv[2, 2]
    x = x / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    y = y / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Element taps.  Both batched-window alternatives measured SLOWER on
    # this backend (r4 probes): a 2-D (2,2)-slice gather 380 ms -> 13 s
    # per P16 call, and per-row 1-D (2,)-window gathers 380 -> 566 ms —
    # unlike the hash-table's (C,)-window gathers, image-warp windows do
    # not amortize here.
    def tap(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        return jnp.where(inb, img[yc, xc], 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def _apply_h(tf: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """(3,3) homography applied to (K,2) pixel coords."""
    x = tf[0, 0] * uv[:, 0] + tf[0, 1] * uv[:, 1] + tf[0, 2]
    y = tf[1, 0] * uv[:, 0] + tf[1, 1] * uv[:, 1] + tf[1, 2]
    w = tf[2, 0] * uv[:, 0] + tf[2, 1] * uv[:, 1] + tf[2, 2]
    w = jnp.maximum(w, 1e-12)
    return jnp.stack([x / w, y / w], axis=-1)


@se3.f32_precision
def _fused_core(
    gray_pool: jnp.ndarray,    # (S, H, W) float32 (masked gray, [0,255])
    depth_pool: jnp.ndarray,   # (S, H, W) float32 (masked, post-pipeline)
    normal_pool: jnp.ndarray,  # (S, H, W, 3) float32
    K: jnp.ndarray,            # (3, 3) camera intrinsics
    slotA: jnp.ndarray,        # (P,) int32 pool slot of the newer frame
    slotB: jnp.ndarray,        # (P,) int32
    tfA_inv: jnp.ndarray,      # (P, 3, 3) crop->full-res (also the warp map)
    tfB_inv: jnp.ndarray,      # (P, 3, 3)
    poseA: jnp.ndarray,        # (P, 4, 4) pose_in_model (cam->model)
    poseB: jnp.ndarray,        # (P, 4, 4)
    pair_valid: jnp.ndarray,   # (P,) bool — padded slots excluded
    extra_uv: jnp.ndarray,     # (P, E, 4) track-propagation candidates
    extra_n: jnp.ndarray,      # (P,) int32 count of valid extras
    max_trans: jnp.ndarray,    # (P,) RANSAC model caps
    max_rot_deg: jnp.ndarray,  # (P,)
    key: jax.Array,
    cfg: FusedCorresCfg = FusedCorresCfg(),
) -> jnp.ndarray:
    P = slotA.shape[0]
    M = cfg.matcher.max_matches
    E = cfg.n_extra

    # ---- 1. warp crops on device (replaces host cv2.warpPerspective +
    #         per-call 20 MB crop upload)
    cropsA = jax.vmap(
        lambda s, t: _warp_crop(gray_pool[s], t, cfg.out_size)
    )(slotA, tfA_inv)
    cropsB = jax.vmap(
        lambda s, t: _warp_crop(gray_pool[s], t, cfg.out_size)
    )(slotB, tfB_inv)

    # ---- 2. match (vmapped Harris+ZNCC; the LoFTR-slot engine)
    res = jax.vmap(lambda a, b: matcher_mod.match_pair(a, b, cfg.matcher))(
        cropsA, cropsB
    )
    corres = res["corres"]          # (P, M, 5) crop-frame, compacted valid-first
    mvalid = res["valid"]           # (P, M)

    # ---- 3. unwarp to full-res pixels
    uvA = jax.vmap(_apply_h)(tfA_inv, corres[..., 0:2])  # (P, M, 2)
    uvB = jax.vmap(_apply_h)(tfB_inv, corres[..., 2:4])
    conf = corres[..., 4]

    # ---- 4. merge host-provided track-propagation candidates after the
    #         matcher's valid rows (reference MapPoint propagation; legacy
    #         path concatenates then truncates to max_matches)
    n_valid = jnp.sum(mvalid, axis=-1).astype(jnp.int32)  # (P,)
    row = jax.lax.broadcasted_iota(jnp.int32, (P, M), 1)
    ei = row - n_valid[:, None]                           # extra index per row
    use_extra = (ei >= 0) & (ei < jnp.minimum(extra_n, E)[:, None])
    eic = jnp.clip(ei, 0, E - 1)
    exA = jnp.take_along_axis(extra_uv[..., 0:2], eic[..., None], axis=1)
    exB = jnp.take_along_axis(extra_uv[..., 2:4], eic[..., None], axis=1)
    uvA = jnp.where(use_extra[..., None], exA, uvA)
    uvB = jnp.where(use_extra[..., None], exB, uvB)
    conf = jnp.where(use_extra, 0.5, conf)
    row_valid = mvalid | use_extra

    # ---- 5. 3D gate (rawMatchesToCorres parity: round, bounds, z > 0.1)
    H, W = gray_pool.shape[1:3]
    uvAi = jnp.round(uvA).astype(jnp.int32)
    uvBi = jnp.round(uvB).astype(jnp.int32)
    inb = (
        (uvAi[..., 0] >= 0) & (uvAi[..., 0] < W)
        & (uvAi[..., 1] >= 0) & (uvAi[..., 1] < H)
        & (uvBi[..., 0] >= 0) & (uvBi[..., 0] < W)
        & (uvBi[..., 1] >= 0) & (uvBi[..., 1] < H)
    )
    uvAc = jnp.stack(
        [jnp.clip(uvAi[..., 0], 0, W - 1), jnp.clip(uvAi[..., 1], 0, H - 1)], -1
    )
    uvBc = jnp.stack(
        [jnp.clip(uvBi[..., 0], 0, W - 1), jnp.clip(uvBi[..., 1], 0, H - 1)], -1
    )

    def gather_maps(slot, uvc):
        # (M,2) int lookups into this pair's frame maps
        d = depth_pool[slot][uvc[:, 1], uvc[:, 0]]
        n = normal_pool[slot][uvc[:, 1], uvc[:, 0]]
        return d, n

    zA, nrmA = jax.vmap(gather_maps)(slotA, uvAc)
    zB, nrmB = jax.vmap(gather_maps)(slotB, uvBc)
    gate_valid = row_valid & inb & (zA > 0.1) & (zB > 0.1) & pair_valid[:, None]

    # camera-space points from depth (exact xyz reconstruction — the host
    # pool stores xyz = depth_to_xyz(depth, K), bit-equal to this formula)
    def xyz_of(uvc, z):
        x = (uvc[..., 0].astype(jnp.float32) - K[0, 2]) / K[0, 0] * z
        y = (uvc[..., 1].astype(jnp.float32) - K[1, 2]) / K[1, 1] * z
        return jnp.stack([x, y, z], axis=-1)

    pA = xyz_of(uvAc, zA)  # (P, M, 3)
    pB = xyz_of(uvBc, zB)

    # ---- 6. model frame + RANSAC (one inlined multi-pair program)
    RA = poseA[:, :3, :3]
    RB = poseB[:, :3, :3]
    ptsA = jnp.einsum("pij,pmj->pmi", RA, pA) + poseA[:, None, :3, 3]
    ptsB = jnp.einsum("pij,pmj->pmi", RB, pB) + poseB[:, None, :3, 3]
    nA_m = jnp.einsum("pij,pmj->pmi", RA, nrmA)
    nB_m = jnp.einsum("pij,pmj->pmi", RB, nrmB)
    rres = ransac_ops.ransac_multi_pair(
        key, ptsA, ptsB, nA_m, nB_m, gate_valid, cfg.ransac,
        max_trans, max_rot_deg,
    )
    return {
        "uvA": uvA, "uvB": uvB, "conf": conf,
        "row_valid": row_valid, "gate_valid": gate_valid,
        "inlier": rres["inliers"],
        "pA": pA, "pB": pB,                     # camera-frame 3D points
        "pose": rres["pose"], "n_inliers": rres["n_inliers"],
        "ok": rres["ok"], "n_matcher_valid": n_valid,
    }


def _pack_core_result(res) -> jnp.ndarray:
    """Pack the _fused_core dict into the single (P, M+3, 8) readback
    buffer (layout documented in the module docstring)."""
    P = res["uvA"].shape[0]
    per_match = jnp.stack(
        [
            res["uvA"][..., 0], res["uvA"][..., 1],
            res["uvB"][..., 0], res["uvB"][..., 1],
            res["conf"],
            res["row_valid"].astype(jnp.float32),
            res["gate_valid"].astype(jnp.float32),
            res["inlier"].astype(jnp.float32),
        ],
        axis=-1,
    )  # (P, M, 8)
    pose_flat = res["pose"].reshape(P, 16)
    meta = jnp.concatenate(
        [
            pose_flat,
            res["n_inliers"].astype(jnp.float32)[:, None],
            res["ok"].astype(jnp.float32)[:, None],
            res["n_matcher_valid"].astype(jnp.float32)[:, None],
            jnp.zeros((P, 5), jnp.float32),
        ],
        axis=-1,
    ).reshape(P, 3, 8)
    return jnp.concatenate([per_match, meta], axis=1)  # (P, M+3, 8)


fused_find_corres = partial(jax.jit, static_argnames=("cfg",))(
    lambda *a, **kw: _pack_core_result(_fused_core(*a, **kw)))

# Per-pair packed-call layout: 6 scalars + two 3x3 inverse homographies +
# two 4x4 poses = 56 floats, then the (E, 4) extra-candidate block.  One
# host->device buffer per call (~35 ms fixed tunnel cost) instead of ~14
# separate small transfers.
_HEAD = 56


def pack_call(pairs_data, n_extra: int) -> "np.ndarray":
    """Assemble the (P, 56 + 4E) float32 call buffer on host.

    pairs_data: list of dicts with keys slotA, slotB, valid, tfA_inv,
    tfB_inv, poseA, poseB, extra_uv (n, 4), max_trans, max_rot_deg.
    """
    import numpy as np

    P = len(pairs_data)
    E = n_extra
    buf = np.zeros((P, _HEAD + 4 * E), np.float32)
    for i, d in enumerate(pairs_data):
        ex = np.asarray(d.get("extra_uv", np.zeros((0, 4))), np.float32)[:E]
        buf[i, 0] = d["slotA"]
        buf[i, 1] = d["slotB"]
        buf[i, 2] = 1.0 if d.get("valid", True) else 0.0
        buf[i, 3] = len(ex)
        buf[i, 4] = d["max_trans"]
        buf[i, 5] = d["max_rot_deg"]
        buf[i, 6:15] = np.asarray(d["tfA_inv"], np.float32).reshape(-1)
        buf[i, 15:24] = np.asarray(d["tfB_inv"], np.float32).reshape(-1)
        buf[i, 24:40] = np.asarray(d["poseA"], np.float32).reshape(-1)
        buf[i, 40:56] = np.asarray(d["poseB"], np.float32).reshape(-1)
        if len(ex):
            buf[i, _HEAD:_HEAD + 4 * len(ex)] = ex.reshape(-1)
    return buf


@partial(jax.jit, static_argnames=("cfg",))
def fused_find_corres_packed(
    gray_pool: jnp.ndarray,
    depth_pool: jnp.ndarray,
    normal_pool: jnp.ndarray,
    K: jnp.ndarray,
    packed: jnp.ndarray,   # (P, 56 + 4*n_extra) float32 from pack_call
    key: jax.Array,
    cfg: FusedCorresCfg = FusedCorresCfg(),
) -> jnp.ndarray:
    P = packed.shape[0]
    E = cfg.n_extra
    return _pack_core_result(_unpack_and_run(
        gray_pool, depth_pool, normal_pool, K, packed, key, cfg))


def _unpack_and_run(gray_pool, depth_pool, normal_pool, K, packed, key, cfg):
    """Decode the pack_call buffer and run the fused core (shared by the
    standalone corres program and the fused match+BA program,
    ops/fused_track.py)."""
    P = packed.shape[0]
    E = cfg.n_extra
    return _fused_core(
        gray_pool, depth_pool, normal_pool, K,
        slotA=packed[:, 0].astype(jnp.int32),
        slotB=packed[:, 1].astype(jnp.int32),
        tfA_inv=packed[:, 6:15].reshape(P, 3, 3),
        tfB_inv=packed[:, 15:24].reshape(P, 3, 3),
        poseA=packed[:, 24:40].reshape(P, 4, 4),
        poseB=packed[:, 40:56].reshape(P, 4, 4),
        pair_valid=packed[:, 2] > 0.5,
        extra_uv=packed[:, _HEAD:].reshape(P, E, 4),
        extra_n=packed[:, 3].astype(jnp.int32),
        max_trans=packed[:, 4],
        max_rot_deg=packed[:, 5],
        key=key,
        cfg=cfg,
    )


def unpack_result(buf, max_matches: int):
    """Split the packed (P, M+3, 8) readback into a dict of numpy arrays."""
    import numpy as np

    buf = np.asarray(buf)
    M = max_matches
    pm = buf[:, :M, :]
    meta = buf[:, M:, :].reshape(buf.shape[0], 24)
    return {
        "uvA": pm[..., 0:2],
        "uvB": pm[..., 2:4],
        "conf": pm[..., 4],
        "row_valid": pm[..., 5] > 0.5,
        "gate_valid": pm[..., 6] > 0.5,
        "inlier": pm[..., 7] > 0.5,
        "pose": meta[:, :16].reshape(-1, 4, 4),
        "n_inliers": meta[:, 16].astype(np.int32),
        "ok": meta[:, 17] > 0.5,
        "n_matcher_valid": meta[:, 18].astype(np.int32),
    }
