"""Fused per-frame tracking program: BA-pair matching + bundle adjustment
in ONE device launch with ONE packed readback.

Round-4 profiling (BENCH_r04, VERDICT r4 weak #2) showed the per-frame
device choreography as the tracker bottleneck on a tunneled TPU: after the
reference-pair match, the host still issued separate launches/readbacks
for the BA-pair match batch, then assembled BA inputs (including a ~4.6 MB
re-upload of downsampled dense maps) and launched the BA solve — >= 3
blocking readbacks x ~40 ms RTT per frame before any compute.

This module collapses the tail of that choreography:

    warp+match+gate+RANSAC for the frame's FRESH pairs   [fused_corres core]
  → merge their in-program edges with host-uploaded edges of pairs
    matched on EARLIER frames (store.matches, ~270 KB)
  → derive the dense-term maps by strided downsampling of the resident
    DeviceFramePool depth/normal maps (replaces the per-frame 4.6 MB
    dense-map upload; reference CUDACache keeps these GPU-resident too)
  → Gauss-Newton BA (tracking/ba.py core)
  → ONE readback: fresh-pair match tables + optimized poses + chi2.

Reference anchors: the reference's whole per-frame loop runs in one
process with zero host<->device round trips beyond kernel launches
(bundlesdf.py:391-506; optimizeGPU Bundler.cpp:810-956 reads the match
tables and CUDACache directly from GPU memory).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..tracking import ba as ba_mod
from ..utils import se3
from . import fused_corres as fc


class FusedTrackCfg(NamedTuple):
    corres: fc.FusedCorresCfg = fc.FusedCorresCfg()
    ba: ba_mod.BAParams = ba_mod.BAParams()
    n_frames: int = 10     # BA pose-graph width (max_BA_frames)
    host_edge_cap: int = 8192  # capacity for edges of already-matched pairs


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=())
@se3.f32_precision
def fused_match_ba(
    gray_pool: jnp.ndarray,     # (S, H, W) device frame pool
    depth_pool: jnp.ndarray,    # (S, H, W)
    normal_pool: jnp.ndarray,   # (S, H, W, 3)
    K: jnp.ndarray,             # (3, 3)
    packed: jnp.ndarray,        # (P, 56+4E) fresh pairs (fc.pack_call)
    fresh_lij: jnp.ndarray,     # (P, 2) int32 local BA indices (li, lj)
    key: jax.Array,
    poses: jnp.ndarray,         # (N, 4, 4) local-frame poses (padded)
    fixed: jnp.ndarray,         # (N,) bool
    frame_slot: jnp.ndarray,    # (N,) int32 pool slot per local frame
    h_ii: jnp.ndarray,          # (Eh,) int32 host-edge local indices
    h_jj: jnp.ndarray,          # (Eh,)
    h_pi: jnp.ndarray,          # (Eh, 3) camera-frame points
    h_pj: jnp.ndarray,          # (Eh, 3)
    h_valid: jnp.ndarray,       # (Eh,) bool
    pair_i: jnp.ndarray,        # (Q,) dense-term pair local indices
    pair_j: jnp.ndarray,        # (Q,)
    pair_valid: jnp.ndarray,    # (Q,) bool
    cfg: FusedTrackCfg = FusedTrackCfg(),
):
    """Returns (corres_readback (P, M+3, 8), poses_out (N, 4, 4), info)."""
    N = cfg.n_frames
    P = packed.shape[0]
    M = cfg.corres.matcher.max_matches

    # ---- 1. fresh-pair match (warp -> match -> gate -> RANSAC)
    res = fc._unpack_and_run(
        gray_pool, depth_pool, normal_pool, K, packed, key, cfg.corres)

    # ---- 2. edge set = host edges (earlier frames) + fresh in-program
    # edges.  Fresh pair p contributes its M rows with weight
    # inlier & gate; padded/invalid pairs carry zero weight.
    f_w = res["inlier"] & res["gate_valid"]          # (P, M)
    f_ii = jnp.broadcast_to(fresh_lij[:, 0:1], (P, M)).reshape(-1)
    f_jj = jnp.broadcast_to(fresh_lij[:, 1:2], (P, M)).reshape(-1)
    f_pi = res["pA"].reshape(-1, 3)
    f_pj = res["pB"].reshape(-1, 3)
    f_valid = (f_w & (fresh_lij[:, 0:1] >= 0)).reshape(-1)
    ii = jnp.concatenate([h_ii, jnp.clip(f_ii, 0, N - 1)])
    jj = jnp.concatenate([h_jj, jnp.clip(f_jj, 0, N - 1)])
    pi = jnp.concatenate([h_pi, f_pi])
    pj = jnp.concatenate([h_pj, f_pj])
    cvalid = jnp.concatenate([h_valid, f_valid])

    # ---- 3. dense maps from the resident pool (strided downsample; the
    # pool holds the exact post-pipeline host maps at 0.1 mm / 1/127
    # quantization, far below the dense gates' 2 cm / 45 deg thresholds)
    f = cfg.ba.image_downscale
    d_ds = depth_pool[frame_slot][:, ::f, ::f]           # (N, h, w)
    n_ds = normal_pool[frame_slot][:, ::f, ::f]          # (N, h, w, 3)
    h, w = d_ds.shape[1:3]
    K_ds = K.at[:2].mul(1.0 / f)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = (u - K_ds[0, 2]) / K_ds[0, 0] * d_ds
    y = (v - K_ds[1, 2]) / K_ds[1, 1] * d_ds
    xyz_ds = jnp.stack([x, y, d_ds], axis=-1)
    ok_ds = (d_ds > 0.1) & (jnp.linalg.norm(n_ds, axis=-1) > 0.5)
    ok_ds = ok_ds & (frame_slot >= 0)[:, None, None]

    # ---- 4. BA (the same jitted core inlines here)
    poses_out, info = ba_mod.bundle_adjust(
        poses, fixed, ii, jj, pi, pj, cvalid,
        pair_i, pair_j, pair_valid,
        xyz_ds, n_ds, ok_ds, K_ds, cfg.ba, N,
    )

    # ---- 5. one packed readback
    corres_buf = fc._pack_core_result(res)
    return corres_buf, poses_out, info


def assemble_host_edges(matches: dict, pair_keys, local_idx: dict,
                        cap: int, per_pair_cap: int = 256):
    """Host-side edge arrays for pairs already matched on earlier frames
    (store.matches), mirroring Bundler.optimize's assembly: up to
    ``per_pair_cap`` inlier correspondences per pair, camera-frame points.

    pair_keys: iterable of (idA, idB) keys to include.
    local_idx: frame id -> local BA index.
    Returns (ii, jj, pi, pj, valid) numpy arrays of length ``cap``.
    """
    import numpy as np

    ii = np.zeros(cap, np.int32)
    jj = np.zeros(cap, np.int32)
    pi = np.zeros((cap, 3), np.float32)
    pj = np.zeros((cap, 3), np.float32)
    valid = np.zeros(cap, bool)
    e = 0
    for key in pair_keys:
        m = matches.get(key)
        if m is None:
            continue
        sel = np.nonzero(m["inlier"])[0][:per_pair_cap]
        k = min(len(sel), cap - e)
        if k <= 0:
            break
        sel = sel[:k]
        ii[e:e + k] = local_idx[key[0]]
        jj[e:e + k] = local_idx[key[1]]
        pi[e:e + k] = m["pA"][sel]
        pj[e:e + k] = m["pB"][sel]
        valid[e:e + k] = True
        e += k
    return ii, jj, pi, pj, valid
