"""Multiresolution hash-grid positional encoder (instant-NGP style).

TPU-native replacement for the reference's CUDA grid encoder
(mycuda/torch_ngp_grid_encoder/gridencoder.cu kernels + grid.py autograd):
the per-level trilinear gather becomes a batched XLA gather and the
backward scatter-add falls out of autodiff of the gather (XLA lowers it to
an efficient sorted scatter on TPU — no atomics needed).

Scheme parity with the reference kernel (gridencoder.cu:155-190):
  * per-level scale  = exp2(level * log2(per_level_scale)) * base - 1
  * resolution       = ceil(scale) + 1
  * pos              = x01 * scale + 0.5   (align_corners = False)
  * dense row-major index when (res+1)^3 fits the table, else spatial hash
    with primes {1, 2654435761, 805459861}
  * trilinear blend of the 8 corners, levels concatenated.

The table is a single (total_entries, level_dim) array with static
per-level offsets — the natural unit to index-shard across devices for the
multi-host map-partitioning path (see parallel/).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861)


class HashGridSpec(NamedTuple):
    """Static hash-grid geometry (hashable; safe as a jit static arg)."""

    num_levels: int
    level_dim: int
    base_res: int
    finest_res: int
    log2_hashmap_size: int

    @property
    def per_level_scale(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(
            np.exp2(np.log2(self.finest_res / self.base_res) / (self.num_levels - 1))
        )

    def level_params(self):
        """Per-level (scale, resolution, table_size, offset, dense?)."""
        hashmap_size = 1 << self.log2_hashmap_size
        out = []
        offset = 0
        S = np.log2(self.per_level_scale)
        for lv in range(self.num_levels):
            scale = float(np.exp2(lv * S) * self.base_res - 1.0)
            res = int(np.ceil(scale)) + 1
            dense_size = (res + 1) ** 3
            size = min(dense_size, hashmap_size)
            # align to 8 like the reference for hardware-friendly strides
            size = int(np.ceil(size / 8)) * 8
            dense = dense_size <= hashmap_size
            out.append(dict(scale=scale, res=res, size=size, offset=offset, dense=dense))
            offset += size
        return out

    @property
    def total_entries(self) -> int:
        return sum(p["size"] for p in self.level_params())

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.level_dim


def init_table(key: jax.Array, spec: HashGridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) init like the reference grid.py reset_parameters."""
    return jax.random.uniform(
        key, (spec.total_entries, spec.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _corner_index(grid_xyz, res: int, size: int, dense: bool):
    """Map integer corner coords (..., 3) -> table row index."""
    if dense:
        stride = res + 1
        idx = (
            grid_xyz[..., 0] * (stride * stride)
            + grid_xyz[..., 1] * stride
            + grid_xyz[..., 2]
        )
        return idx.astype(jnp.uint32) % jnp.uint32(size)
    g = grid_xyz.astype(jnp.uint32)
    h = (
        (g[..., 0] * jnp.uint32(_PRIMES[0]))
        ^ (g[..., 1] * jnp.uint32(_PRIMES[1]))
        ^ (g[..., 2] * jnp.uint32(_PRIMES[2]))
    )
    return h % jnp.uint32(size)


# 8 corner offsets of the trilinear cell, static.
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)


@partial(jax.jit, static_argnames=("spec",))
def hash_encode(x: jnp.ndarray, table: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Encode points x in [-1, 1]^3 -> (N, num_levels * level_dim).

    Out-of-range points are clamped (callers mask validity separately, as
    the reference does in run_network nerf_runner.py:1246).
    """
    x01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
    feats = []
    corners = jnp.asarray(_CORNERS)  # (8, 3)
    for p in spec.level_params():
        pos = x01 * p["scale"] + 0.5
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        pos_grid = pos_grid.astype(jnp.int32)  # (N, 3)
        corner_xyz = pos_grid[:, None, :] + corners[None]  # (N, 8, 3)
        idx = _corner_index(corner_xyz, p["res"], p["size"], p["dense"])
        rows = table[p["offset"] + idx.astype(jnp.int32)]  # (N, 8, C)
        # trilinear weights: prod over dims of (1-frac) or frac
        w = jnp.where(corners[None].astype(bool), frac[:, None, :], 1.0 - frac[:, None, :])
        w = jnp.prod(w, axis=-1)  # (N, 8)
        feats.append(jnp.sum(rows * w[..., None], axis=1))
    return jnp.concatenate(feats, axis=-1)
