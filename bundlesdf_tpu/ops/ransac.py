"""Massively-parallel multi-pair RANSAC rigid-pose estimation.

TPU-native replacement for the reference's GPU RANSAC
(BundleTrack/src/cuda/cuda_ransac.cu:1167-1616: ransacEstimateModelKernel /
ransacEvalModelKernel / findBestInlier, host glue ransacMultiPairGPU) and its
CPU fallback (FeatureManager.cpp:1232-1542).

Design: instead of per-pair CUDA streams with per-trial threads, we express
the whole problem as one jitted program over a dense (n_pairs, n_trials)
grid:

  1. sample 3 correspondence indices per (pair, trial) with a counter-based
     PRNG (static shapes; invalid correspondences handled by masked weights);
  2. closed-form 3-point Kabsch per trial via batched 3x3 SVD (maps to MXU
     batched small-matrix ops);
  3. inlier evaluation as a (n_pairs, n_trials, n_matches) broadcasted
     distance/normal test — an elementwise VPU kernel fused by XLA;
  4. best-trial selection with per-pair trans/rot caps, then a final Kabsch
     refit on all inliers of the best model.

All pairs and trials run in a single launch; no host round-trips.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import se3


class RansacParams(NamedTuple):
    """Static RANSAC parameters (reference config_ho3d.yml:85-96)."""

    n_trials: int = 2000
    inlier_dist: float = 0.005
    inlier_normal_angle_deg: float = 30.0
    max_trans: float = 0.02
    max_rot_deg: float = 30.0
    min_match_after_ransac: int = 5


def _sample_indices(key, n_pairs: int, n_trials: int, n_matches: int, valid):
    """Draw 3 correspondence indices per (pair, trial), uniform over the
    VALID matches only (invalid rows get probability 0).

    Implementation: stable argsort of ~valid lists the valid row indices
    first; a uniform draw in [0, n_valid) indexes into that list.  This is
    3*P*T random draws instead of a (3, P, T, M) categorical-Gumbel tensor
    (~200 MB at the production shapes).  Distinctness is encouraged by
    independent draws; degenerate triples are rejected by the span check,
    as in the reference (FeatureManager.cpp:1271-1304).
    """
    valid_rows = jnp.argsort(~valid, axis=-1, stable=True)  # (P, M)
    n_valid = jnp.maximum(jnp.sum(valid, axis=-1), 1)       # (P,)
    u = jax.random.uniform(key, (n_pairs, n_trials, 3))
    r = jnp.minimum(
        (u * n_valid[:, None, None]).astype(jnp.int32), (n_valid - 1)[:, None, None]
    )  # (P, T, 3)
    return jax.vmap(lambda vr, ri: vr[ri])(valid_rows, r)   # (P, T, 3)


def _tri_rigid(a: jnp.ndarray, b: jnp.ndarray):
    """Closed-form rigid transform from 3-point correspondences WITHOUT an
    SVD: build orthonormal triangle bases on both sides, R = B_basis @
    A_basis^T, t = c_b - R c_a.  (..., 3, 3) triples -> (..., 4, 4).

    For a minimal 3-point sample this is the exact aligning transform (the
    reference's on-device model estimation is likewise closed-form,
    cuda_ransac.cu ransacEstimateModelKernel); per-trial Jacobi SVDs are
    ~10x the arithmetic for the same model.
    """
    def basis(p):
        e1 = p[..., 1, :] - p[..., 0, :]
        e1 = e1 / (jnp.linalg.norm(e1, axis=-1, keepdims=True) + 1e-12)
        u = p[..., 2, :] - p[..., 0, :]
        e2 = u - jnp.sum(u * e1, axis=-1, keepdims=True) * e1
        e2 = e2 / (jnp.linalg.norm(e2, axis=-1, keepdims=True) + 1e-12)
        e3 = jnp.cross(e1, e2)
        return jnp.stack([e1, e2, e3], axis=-1)  # columns

    A = basis(a)
    B = basis(b)
    R = B @ jnp.swapaxes(A, -1, -2)
    ca = a.mean(axis=-2)
    cb = b.mean(axis=-2)
    t = cb - jnp.einsum("...ij,...j->...i", R, ca)
    T = jnp.zeros(a.shape[:-2] + (4, 4), a.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


@partial(jax.jit, static_argnames=("params",))
@se3.f32_precision
def ransac_multi_pair(
    key: jax.Array,
    pts_a: jnp.ndarray,
    pts_b: jnp.ndarray,
    normals_a: jnp.ndarray,
    normals_b: jnp.ndarray,
    valid: jnp.ndarray,
    params: RansacParams = RansacParams(),
    max_trans: jnp.ndarray | None = None,
    max_rot_deg: jnp.ndarray | None = None,
):
    """Estimate a rigid transform per pair mapping pts_a -> pts_b.

    Args:
      key: PRNG key.
      pts_a, pts_b: (n_pairs, n_matches, 3) corresponding 3D points (already
        in a common/world frame, like the reference which transforms match
        points into model frame before RANSAC, cuda_ransac.cu host glue).
      normals_a, normals_b: (n_pairs, n_matches, 3) unit normals (0 if none).
      valid: (n_pairs, n_matches) bool validity mask.
      max_trans, max_rot_deg: optional per-pair (n_pairs,) model caps
        overriding the static params (the reference's neighbor vs
        non-neighbor gates, config_ho3d.yml:91-94).
    Returns dict with:
      "pose": (n_pairs, 4, 4) refit best model (identity if pair failed);
      "inliers": (n_pairs, n_matches) bool final inlier masks;
      "n_inliers": (n_pairs,) int;
      "ok": (n_pairs,) bool — >= min_match_after_ransac inliers and caps met.
    """
    n_pairs, n_matches, _ = pts_a.shape
    n_trials = params.n_trials
    idx = _sample_indices(key, n_pairs, n_trials, n_matches, valid)  # (P, T, 3)
    take = jax.vmap(lambda p, i: p[i])  # gather per pair

    tri_a = jax.vmap(lambda p, i: p[i])(pts_a, idx.reshape(n_pairs, -1)).reshape(
        n_pairs, n_trials, 3, 3
    )
    tri_b = jax.vmap(lambda p, i: p[i])(pts_b, idx.reshape(n_pairs, -1)).reshape(
        n_pairs, n_trials, 3, 3
    )
    tri_valid = jax.vmap(lambda p, i: p[i])(valid, idx.reshape(n_pairs, -1)).reshape(
        n_pairs, n_trials, 3
    )
    _ = take

    # Degeneracy check: minimum pairwise distance within the triple and
    # distinct indices (reference span/degeneracy checks).
    d01 = jnp.linalg.norm(tri_a[..., 0, :] - tri_a[..., 1, :], axis=-1)
    d02 = jnp.linalg.norm(tri_a[..., 0, :] - tri_a[..., 2, :], axis=-1)
    d12 = jnp.linalg.norm(tri_a[..., 1, :] - tri_a[..., 2, :], axis=-1)
    min_span = jnp.minimum(jnp.minimum(d01, d02), d12)
    distinct = (
        (idx[..., 0] != idx[..., 1])
        & (idx[..., 0] != idx[..., 2])
        & (idx[..., 1] != idx[..., 2])
    )
    # Pairwise-distance consistency between the two point sets (<= 5 mm
    # discrepancy, reference FeatureManager.cpp:1290-1304).
    e01 = jnp.abs(d01 - jnp.linalg.norm(tri_b[..., 0, :] - tri_b[..., 1, :], axis=-1))
    e02 = jnp.abs(d02 - jnp.linalg.norm(tri_b[..., 0, :] - tri_b[..., 2, :], axis=-1))
    e12 = jnp.abs(d12 - jnp.linalg.norm(tri_b[..., 1, :] - tri_b[..., 2, :], axis=-1))
    consistent = jnp.maximum(jnp.maximum(e01, e02), e12) < 0.005
    trial_ok = (
        distinct & tri_valid.all(axis=-1) & (min_span > 1e-4) & consistent
    )  # (P, T)

    # 3-point closed-form rigid solve per (pair, trial) — no per-trial SVD.
    T = _tri_rigid(tri_a, tri_b)  # (P, T, 4, 4)

    # Inlier evaluation grid (P, T, M) as ONE batched MXU matmul per output
    # instead of (P, T, M, 3) einsum intermediates (~200 MB at production
    # shapes):
    #   |R a + t - b|^2 = |a|^2 + |b|^2 + |t|^2
    #                     + 2 a.(R^T t) - 2 vec(R).vec(b (x) a) - 2 b.t
    #   n_b.(R n_a)     =                   vec(R).vec(n_b (x) n_a)
    # -> per-trial weights w(t) against per-match features f(m), K = 16/9.
    Rm = T[..., :3, :3]
    tm = T[..., :3, 3]
    Rt_t = jnp.einsum("ptij,pti->ptj", Rm, tm)          # (P, T, 3) = R^T t
    w_dist = jnp.concatenate(
        [
            -2.0 * Rm.reshape(n_pairs, n_trials, 9),
            2.0 * Rt_t,
            -2.0 * tm,
            jnp.sum(tm * tm, axis=-1, keepdims=True),
        ],
        axis=-1,
    )  # (P, T, 16)
    ba_outer = jnp.einsum("pmi,pmj->pmij", pts_b, pts_a)
    f_dist = jnp.concatenate(
        [
            ba_outer.reshape(n_pairs, n_matches, 9),
            pts_a,
            pts_b,
            jnp.ones((n_pairs, n_matches, 1), pts_a.dtype),
        ],
        axis=-1,
    )  # (P, M, 16)
    dist2 = (
        jnp.einsum("ptk,pmk->ptm", w_dist, f_dist,
                   preferred_element_type=jnp.float32)
        + jnp.sum(pts_a * pts_a, axis=-1)[:, None, :]
        + jnp.sum(pts_b * pts_b, axis=-1)[:, None, :]
    )  # (P, T, M)
    nn_outer = jnp.einsum("pmi,pmj->pmij", normals_b, normals_a)
    cos_n = jnp.einsum(
        "ptk,pmk->ptm",
        Rm.reshape(n_pairs, n_trials, 9),
        nn_outer.reshape(n_pairs, n_matches, 9),
        preferred_element_type=jnp.float32,
    )
    has_n = (jnp.linalg.norm(normals_a, axis=-1) > 0.5) & (
        jnp.linalg.norm(normals_b, axis=-1) > 0.5
    )
    cos_thres = jnp.cos(jnp.deg2rad(params.inlier_normal_angle_deg))
    normal_ok = jnp.where(has_n[:, None], cos_n > cos_thres, True)
    inlier = (
        (dist2 < params.inlier_dist ** 2) & normal_ok & valid[:, None]
    )  # (P, T, M)
    n_inl = jnp.sum(inlier, axis=-1)  # (P, T)

    # Model caps: translation & rotation magnitude vs identity (reference
    # findBestInlier per-pair max trans/rot, cuda_ransac.cu:1420-1460).
    trans_mag = jnp.linalg.norm(tm, axis=-1)
    rot_mag = se3.rotation_geodesic_distance(
        Rm, jnp.broadcast_to(jnp.eye(3), Rm.shape)
    )
    if max_trans is None:
        max_trans = jnp.full((n_pairs,), params.max_trans)
    if max_rot_deg is None:
        max_rot_deg = jnp.full((n_pairs,), params.max_rot_deg)
    cap_ok = (trans_mag <= max_trans[:, None]) & (
        rot_mag <= jnp.deg2rad(max_rot_deg)[:, None]
    )
    score = jnp.where(trial_ok & cap_ok, n_inl, -1)
    best = jnp.argmax(score, axis=-1)  # (P,)

    best_inlier = jax.vmap(lambda m, b: m[b])(inlier, best)  # (P, M)
    best_score = jax.vmap(lambda s, b: s[b])(score, best)

    # Final refit on all inliers of the best trial.
    refit = se3.kabsch(pts_a, pts_b, best_inlier.astype(jnp.float32))
    # Re-evaluate inliers under the refit model.
    moved_r = (
        jnp.einsum("pij,pmj->pmi", refit[..., :3, :3], pts_a)
        + refit[:, None, :3, 3]
    )
    dist_r = jnp.linalg.norm(moved_r - pts_b, axis=-1)
    moved_rn = jnp.einsum("pij,pmj->pmi", refit[..., :3, :3], normals_a)
    cos_rn = jnp.sum(moved_rn * normals_b, axis=-1)
    normal_ok_r = jnp.where(has_n, cos_rn > cos_thres, True)
    final_inlier = (dist_r < params.inlier_dist) & normal_ok_r & valid
    n_final = jnp.sum(final_inlier, axis=-1)

    ok = (best_score >= params.min_match_after_ransac) & (
        n_final >= params.min_match_after_ransac
    )
    eye = jnp.broadcast_to(jnp.eye(4), refit.shape)
    pose = jnp.where(ok[:, None, None], refit, eye)
    final_inlier = final_inlier & ok[:, None]
    return {
        "pose": pose,
        "inliers": final_inlier,
        "n_inliers": jnp.where(ok, n_final, 0),
        "ok": ok,
    }


@jax.jit
@se3.f32_precision
def procrustes_by_correspondence(
    pts_a: jnp.ndarray,
    pts_b: jnp.ndarray,
    inliers: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted rigid solve on surviving correspondences -> pose increment.

    The reference applies ``pose <- offset @ pose`` where offset aligns the
    new frame's inlier points onto the reference frame's in model frame
    (FeatureManager.cpp:1050-1129 procrustesByCorrespondence).
    """
    return se3.kabsch(pts_a, pts_b, inliers.astype(jnp.float32))
