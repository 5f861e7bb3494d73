"""Feature matching between preprocessed image pairs.

The reference matches pairs with a vendored LoFTR transformer
(BundleTrack/LoFTR/src/loftr/loftr.py, driven through loftr_wrapper.py)
loaded from a pretrained checkpoint.  This module provides the framework's
matching engines:

  * ``CornerMatcher`` — a from-scratch, fully-jitted classical matcher
    (Harris corners + ZNCC patch descriptors + mutual nearest neighbor)
    that needs no pretrained weights.  Because the pair-preprocessing stage
    (tracking/corres.py) already rotation- and scale-normalizes both crops
    (mirroring FeatureManager::processImagePair, FeatureManager.cpp:126-257),
    a ZNCC matcher is effective for the frame-to-frame and
    keyframe-to-keyframe matching the tracker needs.  Static shapes: top-K
    corners per image, (K, K) similarity on the MXU, fixed-size outputs
    with validity masks.

  * ``LoftrMatcher`` (models/loftr_jax.py) — a LoFTR-class detector-free
    transformer with the same coarse dual-softmax + fine refinement
    architecture, usable with converted reference weights.

Both produce the same output contract as LoftrRunner.predict
(loftr_wrapper.py:29-82): per-pair (N, 5) [uA, vA, uB, vB, conf] arrays —
here fixed-capacity with a validity mask.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CornerMatcherCfg(NamedTuple):
    max_corners: int = 512
    patch: int = 8  # descriptor patch radius -> (2p, 2p) window sampled
    nms_radius: int = 2
    min_conf: float = 0.5
    max_matches: int = 512
    harris_k: float = 0.04


def _sobel(img: jnp.ndarray):
    gx = (
        jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)
    ) * 0.5
    gy = (
        jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)
    ) * 0.5
    return gx, gy


def _box_blur(img: jnp.ndarray, r: int):
    k = 2 * r + 1
    return jax.lax.reduce_window(img, 0.0, jax.lax.add, (k, k), (1, 1), "SAME") / (k * k)


def harris_response(img: jnp.ndarray, k: float = 0.04) -> jnp.ndarray:
    gx, gy = _sobel(img)
    Ixx = _box_blur(gx * gx, 2)
    Iyy = _box_blur(gy * gy, 2)
    Ixy = _box_blur(gx * gy, 2)
    det = Ixx * Iyy - Ixy * Ixy
    tr = Ixx + Iyy
    return det - k * tr * tr


def _top_corners(resp: jnp.ndarray, cfg: CornerMatcherCfg):
    """NMS + top-K corner extraction. Returns (K, 2) [u, v] + (K,) score."""
    H, W = resp.shape
    r = cfg.nms_radius
    k = 2 * r + 1
    local_max = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME")
    is_max = (resp >= local_max) & (resp > 0)
    # Exclude borders (descriptor patch must fit).
    m = cfg.patch + 1
    v = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    u = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (v >= m) & (v < H - m) & (u >= m) & (u < W - m)
    score = jnp.where(is_max & interior, resp, -jnp.inf)
    flat = score.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, cfg.max_corners)
    uu = (top_idx % W).astype(jnp.float32)
    vv = (top_idx // W).astype(jnp.float32)
    valid = jnp.isfinite(top_scores) & (top_scores > 0)
    return jnp.stack([uu, vv], axis=-1), top_scores, valid


def _descriptors(img: jnp.ndarray, corners: jnp.ndarray, patch: int):
    """ZNCC descriptors: (K, (2p)^2), zero-mean unit-norm patches.

    Element gathers: per-row (2p,)-window and full (2p,2p)-slice gather
    variants both measured SLOWER in the fused program on the tunneled
    backend (r4 probes, see BASELINE.md) — image-space window gathers do
    not amortize the way the hash table's (C,)-windows do."""
    p = patch
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(-p, p), jnp.arange(-p, p), indexing="ij"), axis=-1
    ).reshape(-1, 2)  # (P, 2) [dv, du]
    vu = jnp.stack([corners[:, 1], corners[:, 0]], axis=-1).astype(jnp.int32)  # (K, 2)
    coords = vu[:, None, :] + offs[None]  # (K, P, 2)
    vals = img[coords[..., 0], coords[..., 1]]  # (K, P)
    vals = vals - vals.mean(axis=-1, keepdims=True)
    norm = jnp.linalg.norm(vals, axis=-1, keepdims=True)
    return vals / jnp.maximum(norm, 1e-6)


@partial(jax.jit, static_argnames=("cfg",))
def match_pair(
    img_a: jnp.ndarray,
    img_b: jnp.ndarray,
    cfg: CornerMatcherCfg = CornerMatcherCfg(),
):
    """Match two preprocessed grayscale images ([0,1] or [0,255] floats).

    Returns dict: corres (M, 5) [uA, vA, uB, vB, conf], valid (M,) — fixed
    capacity M = cfg.max_matches.
    """
    a = img_a.astype(jnp.float32)
    b = img_b.astype(jnp.float32)
    a = a / jnp.maximum(a.max(), 1e-6)
    b = b / jnp.maximum(b.max(), 1e-6)
    resp_a = harris_response(a, cfg.harris_k)
    resp_b = harris_response(b, cfg.harris_k)
    ca, sa, va = _top_corners(resp_a, cfg)
    cb, sb, vb = _top_corners(resp_b, cfg)
    da = _descriptors(a, ca, cfg.patch)
    db = _descriptors(b, cb, cfg.patch)
    # ZNCC similarity on the MXU: (K, P) x (P, K).
    sim = jnp.dot(da, db.T, preferred_element_type=jnp.float32)
    sim = jnp.where(va[:, None] & vb[None, :], sim, -2.0)
    best_ab = jnp.argmax(sim, axis=1)  # (K,)
    best_ba = jnp.argmax(sim, axis=0)  # (K,)
    mutual = best_ba[best_ab] == jnp.arange(cfg.max_corners)
    conf = jnp.max(sim, axis=1)
    ok = mutual & (conf > cfg.min_conf) & va
    matched_b = cb[best_ab]  # (K, 2)
    corres = jnp.concatenate([ca, matched_b, conf[:, None]], axis=-1)  # (K, 5)
    # Compact: order by validity then confidence, take max_matches.
    order_key = jnp.where(ok, conf, -jnp.inf)
    top_conf, order = jax.lax.top_k(order_key, cfg.max_matches)
    corres = corres[order]
    valid = jnp.isfinite(top_conf)
    corres = jnp.where(valid[:, None], corres, 0.0)
    return {"corres": corres, "valid": valid}


@partial(jax.jit, static_argnames=("cfg",))
def match_pairs_batched(imgs_a: jnp.ndarray, imgs_b: jnp.ndarray,
                        cfg: CornerMatcherCfg = CornerMatcherCfg()):
    """vmapped multi-pair matching: (B, H, W) x2 -> batched match dict.

    The analogue of the reference's batch-64 LoFTR predict
    (loftr_wrapper.py:43-58) — all pairs in one launch.
    """
    return jax.vmap(lambda a, b: match_pair(a, b, cfg))(imgs_a, imgs_b)


class SiftMatcher:
    """Classical SIFT fallback matcher (reference SiftManager base class,
    FeatureManager.h:98-213 / FeatureManager.cpp detectFeature + mutual-kNN
    findCorres): host-side OpenCV SIFT + ratio-tested mutual matching.

    Same ``predict`` contract as LoftrMatcher / match_pairs_batched:
    (B, H, W) grayscale pairs -> ((B, K, 5) [uA, vA, uB, vB, conf], (B, K)
    valid).  Host-only by design — it is the no-accelerator fallback and
    the parity oracle for the jitted matchers.
    """

    # host engine: no XLA program per batch size -> find_corres skips
    # batch padding entirely (tracking/corres.py)
    compiled = False

    def __init__(self, max_matches: int = 512, ratio: float = 0.8,
                 nfeatures: int = 2000):
        import cv2

        self._cv2 = cv2
        self.max_matches = max_matches
        self.ratio = ratio
        self.sift = cv2.SIFT_create(nfeatures=nfeatures)

    def _match_one(self, a, b):
        import numpy as np
        cv2 = self._cv2

        kA, dA = self.sift.detectAndCompute(a, None)
        kB, dB = self.sift.detectAndCompute(b, None)
        K = self.max_matches
        out = np.zeros((K, 5), np.float32)
        valid = np.zeros(K, bool)
        if dA is None or dB is None or len(kA) < 2 or len(kB) < 2:
            return out, valid
        bf = cv2.BFMatcher(cv2.NORM_L2)
        ab = bf.knnMatch(dA, dB, k=2)
        ba = bf.knnMatch(dB, dA, k=2)
        best_ba = {m[0].queryIdx: m[0].trainIdx for m in ba if len(m) == 2
                   and m[0].distance < self.ratio * m[1].distance}
        rows = []
        for m in ab:
            if len(m) != 2 or m[0].distance >= self.ratio * m[1].distance:
                continue
            if best_ba.get(m[0].trainIdx) != m[0].queryIdx:  # mutual
                continue
            ua, va_ = kA[m[0].queryIdx].pt
            ub, vb_ = kB[m[0].trainIdx].pt
            conf = 1.0 / (1.0 + m[0].distance)
            rows.append((ua, va_, ub, vb_, conf))
        rows.sort(key=lambda r: -r[4])
        n = min(len(rows), K)
        if n:
            out[:n] = rows[:n]
            valid[:n] = True
        return out, valid

    def predict(self, grayAs, grayBs):
        import numpy as np

        a = np.asarray(grayAs)
        b = np.asarray(grayBs)
        if a.dtype != np.uint8:
            mx = max(float(a.max()), 1e-6)
            a = (a / mx * 255 if mx <= 1.5 else a).astype(np.uint8)
            b = (b / mx * 255 if mx <= 1.5 else b).astype(np.uint8)
        outs = [self._match_one(a[i], b[i]) for i in range(len(a))]
        return (np.stack([o[0] for o in outs]),
                np.stack([o[1] for o in outs]))
