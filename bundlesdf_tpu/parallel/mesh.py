"""Device-mesh helpers.

The reference is single-GPU with a process pair (SURVEY.md §2.5); the
TPU-native scale-out axes of this framework are:
  * ``dp``  — data parallel over NOF ray batches (grads psum over ICI);
  * ``mp``  — model parallel over the hash-grid table rows (index-sharded
    embedding) and over BA residual blocks (JtJ/Jtr psum).
Axes live on one ``jax.sharding.Mesh``; GSPMD inserts the collectives.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
