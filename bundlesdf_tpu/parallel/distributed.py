"""Multi-host runtime entry (SURVEY.md §2.5 / §7 Config E).

The reference is a single-GPU, single-host program (its only scale-out was
a pair of processes on one box); the TPU deployment shape is N hosts, each
driving its local chips, coordinated by ``jax.distributed``.  This module
is the one place process bootstrap lives:

  * :func:`init_multihost` — wraps ``jax.distributed.initialize`` with env
    fallbacks, as the standard pod launcher contract (one call, very first
    thing in main, before any backend touch).
  * :func:`global_mesh` — a Mesh over ALL processes' devices; the dp/mp
    shardings in parallel/nof_shard.py and parallel/ba_shard.py work
    unchanged over it (GSPMD inserts ICI collectives within a host and DCN
    collectives across hosts).
  * Video-level scale-out (the embarrassingly-parallel axis, one sequence
    per host) stays in scripts/run_ho3d.py ``--shard i/n``.

Tested by tests/test_multihost.py: two real OS processes on the CPU
backend form one 2-process JAX cluster and run the dp-sharded NOF train
step over the global mesh, asserting identical losses.
"""
from __future__ import annotations

import logging
import os

import numpy as np


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> bool:
    """Join (or skip joining) a multi-host JAX cluster.

    Arguments default from the environment so launchers only export
    ``BSDF_COORDINATOR`` / ``BSDF_NUM_PROCESSES`` / ``BSDF_PROCESS_ID``
    (matching torchrun-style contracts).  On managed TPU pods all three
    may be omitted: ``jax.distributed.initialize()`` autodetects.  Returns
    True when a multi-process runtime was initialized, False for the
    single-process fast path (num_processes absent or == 1).

    Must be called before any other JAX API touches the backend.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("BSDF_COORDINATOR")
    if num_processes is None and "BSDF_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["BSDF_NUM_PROCESSES"])
    if process_id is None and "BSDF_PROCESS_ID" in os.environ:
        process_id = int(os.environ["BSDF_PROCESS_ID"])

    if (num_processes in (None, 1)) and coordinator_address is None:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    logging.info(
        "multihost: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def global_mesh(axis: str = "dp"):
    """A 1-D Mesh over every device in the cluster (all processes).

    Within a host the axis rides ICI; across hosts, DCN.  For shardings
    that should stay host-local (e.g. the hash table mp axis), reshape to
    ('host', 'dp') via :func:`host_by_device_mesh` instead.
    """
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def host_by_device_mesh(host_axis: str = "host", dev_axis: str = "dp"):
    """A 2-D (hosts, devices-per-host) Mesh.

    Row-major device order groups each process's devices contiguously, so
    the ``dev_axis`` collectives ride ICI and only ``host_axis`` touches
    DCN — the layout rule for putting dp inside a host and keyframe-pool /
    video sharding across hosts.
    """
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    n_proc = jax.process_count()
    per = len(devs) // n_proc
    # jax.devices() is sorted by (process_index, local id) for TPU; enforce
    # the grouping explicitly so the guarantee doesn't rest on sort order.
    order = np.argsort([d.process_index * 10_000 + d.id for d in devs],
                       kind="stable")
    grid = devs[order].reshape(n_proc, per)
    return Mesh(grid, (host_axis, dev_axis))
