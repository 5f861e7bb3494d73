"""Neural Object Field networks: hash-grid SDF + color MLP, per-frame pose
correction, per-frame latent features.

Functional JAX re-design of the reference's torch modules
(nerf_helpers.py:243-321 NeRFSmall, :127-154 PoseArray, :108-124
FeatureArray; instantiated in nerf_runner.py:204-242 create_nerf with
num_layers=2, hidden 64, geo_feat 15, num_layers_color=3).  Parameters are
plain pytrees (dicts of arrays) so they compose directly with optax and
jax.sharding partition specs.

Architecture (parity with create_nerf):
  sigma net : Linear(in -> 64) . ReLU . Linear(64 -> 1 + 15); last bias
              init +0.1 (encourage positive SDF outside the surface);
  color net : Linear(sh + frame_feat + 15 -> 64) . ReLU . Linear(64 -> 64)
              . ReLU . Linear(64 -> 3).
Inputs are the hash-grid embedding (ops/hashgrid.py), SH view-direction
encoding (ops/sh.py) and optional per-frame features.  All matmuls are
(batch, features) x (features, hidden) — MXU-shaped; params kept fp32,
activations may be bf16 under mixed precision.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import hashgrid, sh
from ..utils import se3


class NofSpec(NamedTuple):
    """Static NOF architecture spec (hashable — safe as jit static arg)."""

    grid: hashgrid.HashGridSpec
    sh_degree: int = 3
    frame_features: int = 0
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_frames: int = 128
    max_trans: float = 0.02  # already in normalized units (x sc_factor)
    max_rot_deg: float = 20.0
    optimize_poses: bool = True

    @property
    def input_ch(self) -> int:
        return self.grid.out_dim

    @property
    def input_ch_views(self) -> int:
        return sh.sh_out_dim(self.sh_degree) + self.frame_features


def _linear_init(key, fan_in, fan_out):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(k1, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound)
    return w.astype(jnp.float32), b.astype(jnp.float32)


def init_nof_params(key: jax.Array, spec: NofSpec) -> dict:
    ks = jax.random.split(key, 8)
    h, g = spec.hidden_dim, spec.geo_feat_dim
    s_w0, s_b0 = _linear_init(ks[0], spec.input_ch, h)
    s_w1, s_b1 = _linear_init(ks[1], h, 1 + g)
    s_b1 = s_b1.at[:].set(0.1)  # positive-SDF bias (reference NeRFSmall init)
    c_in = spec.input_ch_views + g
    c_w0, c_b0 = _linear_init(ks[2], c_in, h)
    c_w1, c_b1 = _linear_init(ks[3], h, h)
    c_w2, c_b2 = _linear_init(ks[4], h, 3)
    params = {
        "table": hashgrid.init_table(ks[5], spec.grid),
        "sigma": {"w0": s_w0, "b0": s_b0, "w1": s_w1, "b1": s_b1},
        "color": {"w0": c_w0, "b0": c_b0, "w1": c_w1, "b1": c_b1, "w2": c_w2, "b2": c_b2},
        "pose_array": jnp.zeros((spec.num_frames, 6), dtype=jnp.float32),
    }
    if spec.frame_features > 0:
        params["feature_array"] = jax.random.normal(
            ks[6], (spec.num_frames, spec.frame_features), dtype=jnp.float32
        )
    return params


def pose_array_matrices(pose_data: jnp.ndarray, spec: NofSpec, ids: jnp.ndarray) -> jnp.ndarray:
    """Per-frame tanh-bounded 6-DoF correction -> (len(ids), 4, 4).

    Parity with reference PoseArray.get_matrices (nerf_helpers.py:142-154):
    trans = tanh(.)*max_trans, rot = tanh(.)*max_rot; frame 0 pinned to
    identity.
    """
    theta = jnp.tanh(pose_data)
    trans = theta[:, :3] * spec.max_trans
    rot = theta[:, 3:6] * (spec.max_rot_deg / 180.0 * np.pi)
    Ts = se3.se3_exp(jnp.concatenate([trans, rot], axis=-1))
    eye = jnp.eye(4, dtype=Ts.dtype)
    Ts = jnp.where((jnp.arange(pose_data.shape[0]) == 0)[:, None, None], eye, Ts)
    return Ts[ids]


def _mlp_sigma(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = jnp.maximum(x @ params["w0"] + params["b0"], 0.0)
    return h @ params["w1"] + params["b1"]  # (..., 1 + geo_feat)


def _mlp_color(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = jnp.maximum(x @ params["w0"] + params["b0"], 0.0)
    h = jnp.maximum(h @ params["w1"] + params["b1"], 0.0)
    return h @ params["w2"] + params["b2"]  # (..., 3)


@partial(jax.jit, static_argnames=("spec",))
def nof_forward(
    params: dict,
    spec: NofSpec,
    pts: jnp.ndarray,
    viewdirs: jnp.ndarray,
    frame_ids: jnp.ndarray,
):
    """Full field query.

    Args:
      pts: (N, S, 3) points in the normalized object frame ([-1,1]^3).
      viewdirs: (N, 3) unit view directions in the object frame.
      frame_ids: (N,) int frame indices (for per-frame features).
    Returns:
      raw: (N, S, 4) = [rgb_logits(3), sdf(1)]; valid: (N, S) inside-cube.
    """
    N, S = pts.shape[:2]
    flat = pts.reshape(-1, 3)
    valid = jnp.all(jnp.abs(flat) <= 1.0, axis=-1).reshape(N, S)
    # rays are axis 0 with z-ordered samples contiguous -> the encode's
    # backward can segment-dedup its scatters (spec.grid.scatter == 'seg')
    emb = hashgrid.encode(flat, params["table"], spec.grid, n_rays=N)
    emb = jnp.where(valid.reshape(-1, 1), emb, 0.0)  # reference zeroes invalid
    h = _mlp_sigma(params["sigma"], emb)  # (N*S, 1+g)
    sdf = h[:, :1]
    geo = h[:, 1:]
    dirs_emb = sh.sh_encode(viewdirs, spec.sh_degree)  # (N, sh)
    if spec.frame_features > 0:
        feats = params["feature_array"][frame_ids]  # (N, F)
        dirs_emb = jnp.concatenate([dirs_emb, feats], axis=-1)
    dirs_flat = jnp.broadcast_to(dirs_emb[:, None, :], (N, S, dirs_emb.shape[-1]))
    c_in = jnp.concatenate([dirs_flat.reshape(N * S, -1), geo], axis=-1)
    rgb = _mlp_color(params["color"], c_in)
    raw = jnp.concatenate([rgb, sdf], axis=-1).reshape(N, S, 4)
    return raw, valid


@partial(jax.jit, static_argnames=("spec",))
def nof_sdf(params: dict, spec: NofSpec, pts: jnp.ndarray) -> jnp.ndarray:
    """SDF-only query for mesh extraction (reference forward_sdf /
    run_network_density nerf_runner.py:1306-1346).  pts: (N, 3) -> (N,)."""
    emb = hashgrid.encode(pts, params["table"], spec.grid)
    h = _mlp_sigma(params["sigma"], emb)
    return h[:, 0]
