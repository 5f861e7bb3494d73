"""Pose-graph bundle adjustment: sparse feature term + dense point-to-plane
ICP term, Gauss-Newton with direct normal-equation solves.

TPU-native re-design of the reference GPU solver stack
(BundleTrack/src/cuda/LossGPU.cpp OptimizerGpu::optimizeFrames; Solver/*
SolverBundling.cu solveBundlingStub: 7 outer Gauss-Newton x 5 PCG inner
iterations over a Lie-algebra parameterization, sparse Huber feature
residuals ||Ti pi - Tj pj|| + dense point-to-plane residuals re-associated
every outer iteration at 1/4 image resolution).

Re-design rationale: the BA problem has N <= max_BA_frames (10) poses, so
the normal-equations matrix is only (6N, 6N).  Building JtJ as dense
segment-sum reductions over all residuals (one fused XLA program) and
solving directly is far better matched to the TPU than a PCG loop of tiny
sparse ops: each outer iteration is
   residual/Jacobian evaluation (VPU elementwise over E residuals)
 + einsum JtJ assembly (MXU batched outer products)
 + one 60x60 solve.
The residual set is the distributed seam: blocks shard over devices and the
(6N,6N)/(6N,) reductions psum over ICI (see parallel/ba_shard.py).

Conventions: poses are cam-in-model; increments left-multiply
(``T <- exp(xi) T``) with xi = [t(3), w(3)].
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import se3


class BAParams(NamedTuple):
    """Static BA configuration (reference config_ho3d.yml bundle section)."""

    num_iter_outer: int = 7
    robust_delta: float = 0.005
    w_fm: float = 1.0
    w_p2p: float = 1.0
    image_downscale: int = 4
    dense_max_dist: float = 0.02
    dense_max_normal_angle: float = 45.0
    icp_rot_thres_deg: float = 60.0
    damping: float = 1e-4


def _skew(v):
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], -1),
        ],
        -2,
    )


def _feature_system(poses, ii, jj, pi, pj, valid, delta: float, n_frames: int):
    """Sparse feature-term contributions to (H, b).

    Residual r = Ti pi - Tj pj (model frame), Huber-weighted IRLS
    (reference SolverBundlingEquationsLie.h sparse term, robust_delta
    config_ho3d.yml:49).
    Returns H (N, N, 6, 6), b (N, 6), chi2 scalar.
    """
    Ti = poses[ii]  # (E, 4, 4)
    Tj = poses[jj]
    xi_w = jnp.einsum("eab,eb->ea", Ti[:, :3, :3], pi) + Ti[:, :3, 3]
    xj_w = jnp.einsum("eab,eb->ea", Tj[:, :3, :3], pj) + Tj[:, :3, 3]
    r = xi_w - xj_w  # (E, 3)
    rn = jnp.linalg.norm(r, axis=-1)
    huber_w = jnp.where(rn <= delta, 1.0, delta / jnp.maximum(rn, 1e-12))
    w = huber_w * valid.astype(r.dtype)

    # J_i = [I | -skew(xi_w)], J_j = -[I | -skew(xj_w)]  (3, 6) each
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (r.shape[0], 3, 3))
    Jii = jnp.concatenate([eye3, -_skew(xi_w)], axis=-1)  # (E, 3, 6)
    Jjj = -jnp.concatenate([eye3, -_skew(xj_w)], axis=-1)

    H = jnp.zeros((n_frames, n_frames, 6, 6), dtype=r.dtype)
    b = jnp.zeros((n_frames, 6), dtype=r.dtype)
    Wii = Jii * w[:, None, None]
    Wjj = Jjj * w[:, None, None]
    H = H.at[ii, ii].add(jnp.einsum("eai,eaj->eij", Wii, Jii))
    H = H.at[ii, jj].add(jnp.einsum("eai,eaj->eij", Wii, Jjj))
    H = H.at[jj, ii].add(jnp.einsum("eai,eaj->eij", Wjj, Jii))
    H = H.at[jj, jj].add(jnp.einsum("eai,eaj->eij", Wjj, Jjj))
    b = b.at[ii].add(jnp.einsum("eai,ea->ei", Wii, r))
    b = b.at[jj].add(jnp.einsum("eai,ea->ei", Wjj, r))
    chi2 = jnp.sum(w * rn * rn)
    return H, b, chi2


def _dense_system(
    poses, pair_i, pair_j, pair_valid,
    xyz_ds, normal_ds, valid_ds, K_ds,
    params: BAParams, n_frames: int,
):
    """Dense point-to-plane contributions, re-associated projectively.

    For each active pair (i, j): transform i's downsampled points into j's
    camera, project with K_ds, gather j's xyz/normals, gate by distance and
    normal agreement, accumulate r = n_j . (x_i - x_j) residuals.
    (Reference FindDenseCorrespondences/BuildDenseSystem
    SolverBundling.cu:78-479.)
    """
    h, w3 = xyz_ds.shape[1:3]
    n_pix = h * w3
    dtype = poses.dtype

    Ti = poses[pair_i]  # (P, 4, 4)
    Tj = poses[pair_j]
    Tj_inv = se3.inv_pose(Tj)
    rel = Tj_inv @ Ti  # i cam -> j cam

    # Gate whole pairs by relative rotation (icp_pose_rot_thres).
    rot = se3.rotation_geodesic_distance(
        rel[:, :3, :3], jnp.broadcast_to(jnp.eye(3, dtype=dtype), rel[:, :3, :3].shape)
    )
    pair_ok = pair_valid & (rot <= jnp.deg2rad(params.icp_rot_thres_deg))

    pts_i = xyz_ds[pair_i].reshape(-1, n_pix, 3)  # (P, n_pix, 3)
    nrm_i = normal_ds[pair_i].reshape(-1, n_pix, 3)
    ok_i = valid_ds[pair_i].reshape(-1, n_pix)

    p_in_j = jnp.einsum("pab,pnb->pna", rel[:, :3, :3], pts_i) + rel[:, None, :3, 3]
    z = p_in_j[..., 2]
    u = K_ds[0, 0] * p_in_j[..., 0] / jnp.maximum(z, 1e-6) + K_ds[0, 2]
    v = K_ds[1, 1] * p_in_j[..., 1] / jnp.maximum(z, 1e-6) + K_ds[1, 2]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < w3) & (vi >= 0) & (vi < h) & (z > 0.1)
    ui = jnp.clip(ui, 0, w3 - 1)
    vi = jnp.clip(vi, 0, h - 1)

    xyz_j = xyz_ds[pair_j]  # (P, h, w, 3)
    nrm_j = normal_ds[pair_j]
    val_j = valid_ds[pair_j]
    tgt = jax.vmap(lambda img, vv, uu: img[vv, uu])(xyz_j, vi, ui)  # (P, n_pix, 3)
    tgt_n = jax.vmap(lambda img, vv, uu: img[vv, uu])(nrm_j, vi, ui)
    tgt_ok = jax.vmap(lambda img, vv, uu: img[vv, uu])(val_j, vi, ui)

    # world coords for jacobians/residuals
    x_i_w = jnp.einsum("pab,pnb->pna", Ti[:, :3, :3], pts_i) + Ti[:, None, :3, 3]
    x_j_w = jnp.einsum("pab,pnb->pna", Tj[:, :3, :3], tgt) + Tj[:, None, :3, 3]
    n_j_w = jnp.einsum("pab,pnb->pna", Tj[:, :3, :3], tgt_n)
    n_i_w = jnp.einsum("pab,pnb->pna", Ti[:, :3, :3], nrm_i)

    diff = x_i_w - x_j_w
    dist = jnp.linalg.norm(diff, axis=-1)
    n_dot = jnp.sum(n_i_w * n_j_w, axis=-1)
    cos_th = jnp.cos(jnp.deg2rad(params.dense_max_normal_angle))
    has_n = (jnp.linalg.norm(tgt_n, axis=-1) > 0.5) & (jnp.linalg.norm(nrm_i, axis=-1) > 0.5)
    ok = (
        ok_i & inb & tgt_ok & has_n
        & (dist < params.dense_max_dist) & (n_dot > cos_th)
        & pair_ok[:, None]
    )
    w = ok.astype(dtype)

    r = jnp.sum(n_j_w * diff, axis=-1)  # (P, n_pix)
    # J_i = [n | x_i x n], J_j = -[n | x_j x n]
    Ji = jnp.concatenate([n_j_w, jnp.cross(x_i_w, n_j_w)], axis=-1)  # (P, n_pix, 6)
    Jj = -jnp.concatenate([n_j_w, jnp.cross(x_j_w, n_j_w)], axis=-1)

    H = jnp.zeros((n_frames, n_frames, 6, 6), dtype=dtype)
    b = jnp.zeros((n_frames, 6), dtype=dtype)
    Wi = Ji * w[..., None]
    Wj = Jj * w[..., None]
    Hii = jnp.einsum("pni,pnj->pij", Wi, Ji)
    Hij = jnp.einsum("pni,pnj->pij", Wi, Jj)
    Hji = jnp.einsum("pni,pnj->pij", Wj, Ji)
    Hjj = jnp.einsum("pni,pnj->pij", Wj, Jj)
    bi = jnp.einsum("pni,pn->pi", Wi, r)
    bj = jnp.einsum("pni,pn->pi", Wj, r)
    H = H.at[pair_i, pair_i].add(Hii)
    H = H.at[pair_i, pair_j].add(Hij)
    H = H.at[pair_j, pair_i].add(Hji)
    H = H.at[pair_j, pair_j].add(Hjj)
    b = b.at[pair_i].add(bi)
    b = b.at[pair_j].add(bj)
    chi2 = jnp.sum(w * r * r)
    return H, b, chi2


def solve_gn_step(H, b, fixed, n_frames: int, damping: float):
    """One Gauss-Newton update from assembled normal equations.

    Fixed frames get identity rows/cols and zero rhs (reference
    update_pose_flags freezing, Bundler.cpp:908-914).
    Returns xi (N, 6).
    """
    free = (~fixed).astype(H.dtype)
    mask2 = free[:, None] * free[None, :]
    Hm = H * mask2[:, :, None, None]
    bm = b * free[:, None]
    A = Hm.transpose(0, 2, 1, 3).reshape(n_frames * 6, n_frames * 6)
    diag_boost = jnp.repeat(1.0 - free, 6)
    scale = jnp.maximum(jnp.diagonal(A).max(), 1.0)
    A = A + jnp.diag(diag_boost * scale + damping * scale * jnp.ones(n_frames * 6))
    rhs = -bm.reshape(-1)
    xi = jnp.linalg.solve(A, rhs)
    return xi.reshape(n_frames, 6)


@partial(jax.jit, static_argnames=("params", "n_frames"))
@se3.f32_precision
def bundle_adjust(
    poses: jnp.ndarray,
    fixed: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    pi: jnp.ndarray,
    pj: jnp.ndarray,
    corr_valid: jnp.ndarray,
    pair_i: jnp.ndarray,
    pair_j: jnp.ndarray,
    pair_valid: jnp.ndarray,
    xyz_ds: jnp.ndarray,
    normal_ds: jnp.ndarray,
    valid_ds: jnp.ndarray,
    K_ds: jnp.ndarray,
    params: BAParams = BAParams(),
    n_frames: int = 10,
):
    """Joint pose-graph optimization.

    Args:
      poses: (N, 4, 4) cam-in-model initial poses (N = n_frames, padded).
      fixed: (N,) bool — frozen poses (frame 0 + nerfed keyframes).
      ii, jj: (E,) frame indices of sparse correspondences; pi, pj: (E, 3)
        camera-frame points; corr_valid: (E,) mask.
      pair_i, pair_j: (P,) dense-term pair indices; pair_valid: (P,).
      xyz_ds, normal_ds, valid_ds: (N, h, w, {3,3,1}) downsampled maps.
      K_ds: (3, 3) downsampled intrinsics.
    Returns: (poses_out, info dict).
    """
    delta = params.robust_delta

    def outer(carry, _):
        poses_c = carry
        Hf, bf, chi_f = _feature_system(poses_c, ii, jj, pi, pj, corr_valid, delta, n_frames)
        Hd, bd, chi_d = _dense_system(
            poses_c, pair_i, pair_j, pair_valid, xyz_ds, normal_ds, valid_ds,
            K_ds, params, n_frames,
        )
        H = params.w_fm * Hf + params.w_p2p * Hd
        b = params.w_fm * bf + params.w_p2p * bd
        xi = solve_gn_step(H, b, fixed, n_frames, params.damping)
        upd = se3.se3_exp(xi)
        poses_new = upd @ poses_c
        poses_new = jnp.where(fixed[:, None, None], poses_c, poses_new)
        return poses_new, (chi_f, chi_d)

    poses_out, (chi_f, chi_d) = jax.lax.scan(
        outer, poses, None, length=params.num_iter_outer
    )
    return poses_out, {"chi2_feature": chi_f, "chi2_dense": chi_d}
