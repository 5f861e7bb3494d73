"""Distributed bundle adjustment: residual blocks sharded over devices.

The BA normal equations H = sum_e J_e^T W J_e and b = sum_e J_e^T W r are a
pure reduction over residuals — the natural distributed seam (SURVEY.md §7
step 3).  We shard the sparse-edge arrays and the dense-pair list over the
mesh axis; every device assembles its partial (6N,6N)/(6N,) contributions,
GSPMD psums them over ICI, and each device solves the tiny dense system
identically (replicated poses in, replicated poses out).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tracking import ba as ba_mod
from ..utils import se3


def make_sharded_bundle_adjust(mesh: Mesh, params: ba_mod.BAParams, n_frames: int):
    """Returns a jitted BA fn with edge/pair arrays sharded over 'dp'."""
    edge_sh = NamedSharding(mesh, P("dp"))
    edge_sh2 = NamedSharding(mesh, P("dp", None))
    pair_sh = NamedSharding(mesh, P("dp"))
    frame_sh = NamedSharding(mesh, P())  # dense maps small; replicate

    @jax.jit
    def sharded_ba(poses, fixed, ii, jj, pi, pj, corr_valid,
                   pair_i, pair_j, pair_valid, xyz_ds, normal_ds, valid_ds, K_ds):
        ii = jax.lax.with_sharding_constraint(ii, edge_sh)
        jj = jax.lax.with_sharding_constraint(jj, edge_sh)
        pi = jax.lax.with_sharding_constraint(pi, edge_sh2)
        pj = jax.lax.with_sharding_constraint(pj, edge_sh2)
        corr_valid = jax.lax.with_sharding_constraint(corr_valid, edge_sh)
        pair_i = jax.lax.with_sharding_constraint(pair_i, pair_sh)
        pair_j = jax.lax.with_sharding_constraint(pair_j, pair_sh)
        pair_valid = jax.lax.with_sharding_constraint(pair_valid, pair_sh)
        xyz_ds = jax.lax.with_sharding_constraint(xyz_ds, frame_sh)
        return ba_mod.bundle_adjust(
            poses, fixed, ii, jj, pi, pj, corr_valid,
            pair_i, pair_j, pair_valid, xyz_ds, normal_ds, valid_ds, K_ds,
            params, n_frames,
        )

    return sharded_ba
