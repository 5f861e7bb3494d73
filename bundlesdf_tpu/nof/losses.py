"""Truncated-SDF training losses.

Behavioral parity with the reference loss stack (nerf_helpers.py:367-399
get_masks/get_sdf_loss; assembled in nerf_runner.py:677-760 train_loop):
free-space loss, empty-space loss, truncated-SDF loss supervising
``z + sdf * trunc`` against measured depth, plus RGB/regularization terms.
Pure functions of arrays + scalar weights — everything fuses into the one
jitted train step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossWeights(NamedTuple):
    """Static loss weights (reference config.yml:60-87)."""

    rgb_weight: float = 10.0
    fs_weight: float = 100.0
    empty_weight: float = 0.01
    trunc_weight: float = 6000.0
    fs_sdf: float = 0.001
    neg_trunc_ratio: float = 1.0
    first_frame_weight: float = 10.0
    feature_reg_weight: float = 0.1
    pose_reg_weight: float = 0.0
    near: float = 0.1
    far: float = 2.0
    sc_factor: float = 1.0
    # Optional terms, 0 by default like the reference (config.yml); the
    # reference's tv_loss_weight is config-only — parsed but never applied
    # (nerf_runner.py:115 is its only occurrence) — so it has no equivalent.
    depth_weight: float = 0.0
    fs_rgb_weight: float = 0.0
    eikonal_weight: float = 0.0


def sdf_masks(z_vals, target_d, truncation, w: LossWeights):
    """front/sdf sample masks (reference get_masks nerf_helpers.py:367-381)."""
    valid_depth = (target_d >= w.near * w.sc_factor) & (target_d <= w.far * w.sc_factor)
    front = z_vals < target_d - truncation
    back = z_vals > target_d + truncation * w.neg_trunc_ratio
    sdf_mask = (~front) & (~back) & valid_depth
    return front, sdf_mask


def sdf_losses(z_vals, target_d, sdf, truncation, sample_weights, w: LossWeights):
    """Free-space + empty + truncated-SDF losses.

    Parity with reference get_sdf_loss (nerf_helpers.py:384-399):
      fs    : mean(((sdf - fs_sdf) * m_fs)^2 * sw) * 0.5 with
              m_fs = (target_d > far*sc) & (sdf < fs_sdf);
      empty : mean(|sdf - 1| * m_e * sw) * empty_weight with
              m_e = front & (target_d <= far*sc) & (sdf < 1);
      sdf   : mean(((z + sdf*trunc)*m_s - d*m_s)^2 * sw) * 0.5.
    Args are (N, S) arrays; target_d is (N, 1)-broadcastable.
    Returns (fs_loss, sdf_loss) *before* the cfg fs_weight / trunc_weight
    multipliers (applied by the caller like train_loop does).
    """
    front, sdf_mask = sdf_masks(z_vals, target_d, truncation, w)
    fs_weight_i, sdf_weight_i = 0.5, 0.5

    m_fs = (target_d > w.far * w.sc_factor) & (sdf < w.fs_sdf)
    fs_loss = jnp.mean(((sdf - w.fs_sdf) * m_fs) ** 2 * sample_weights) * fs_weight_i

    m_e = front & (target_d <= w.far * w.sc_factor) & (sdf < 1.0)
    empty_loss = jnp.mean(jnp.abs(sdf - 1.0) * m_e * sample_weights) * w.empty_weight
    fs_loss = fs_loss + empty_loss

    m_s = sdf_mask.astype(sdf.dtype)
    sdf_loss = (
        jnp.mean(((z_vals + sdf * truncation) * m_s - target_d * m_s) ** 2 * sample_weights)
        * sdf_weight_i
    )
    return fs_loss, sdf_loss


def depth_loss(z_vals, sdf, target_d, ray_w, w: LossWeights):
    """First-zero-crossing rendered depth vs measured depth (reference
    nerf_runner.py:709-719): z at the first sign change of the SDF along
    the ray, squared error on rays that (a) have a crossing and (b) carry
    valid depth."""
    signs = sdf[:, 1:] * sdf[:, :-1]
    crossing = signs < 0
    inds = jnp.argmax(crossing.astype(jnp.float32), axis=1)
    z_min = jnp.take_along_axis(z_vals, inds[:, None], axis=1)[:, 0]
    wt = (
        ray_w
        * (target_d <= w.far * w.sc_factor).astype(z_vals.dtype)
        * crossing.any(axis=-1).astype(z_vals.dtype)
    )
    return jnp.mean((z_min * wt - target_d * wt) ** 2)


def fs_rgb_loss(rgb_logits, front_mask, sample_weights):
    """Push free-space color to white (reference nerf_runner.py:728-731)."""
    err = (jax.nn.sigmoid(rgb_logits) - 1.0) * front_mask[..., None]
    return jnp.mean(err**2 * sample_weights[..., None])


def eikonal_loss(normals, sdf):
    """(|grad sdf| - 1)^2 over near-surface samples (reference
    nerf_runner.py:733-736: masked mean over sdf < 1)."""
    mask = (sdf < 1.0).astype(normals.dtype)
    err = (jnp.linalg.norm(normals, axis=-1) - 1.0) ** 2 * mask
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)


def truncation_value(step, n_step, trunc, trunc_start, sc_factor, decay_type: str = ""):
    """Truncation annealing (reference nerf_runner.py:661-674), in
    normalized units (x sc_factor)."""
    if decay_type == "linear":
        t = trunc_start - (trunc_start - trunc) * (step / n_step)
    elif decay_type == "exp":
        lamb = jnp.log(trunc / trunc_start) / (n_step / 4)
        t = jnp.maximum(trunc_start * jnp.exp(step * lamb), trunc)
    else:
        t = trunc
    return t * sc_factor
