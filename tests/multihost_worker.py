"""Worker process for tests/test_multihost.py.

Joins a 2-process JAX cluster on the CPU backend (2 local devices each =
4 global), builds the global dp mesh, and runs one dp-sharded +
table-sharded NOF train step (parallel/nof_shard.py) over it — the same
program the TPU pod runs, with DCN stood in by localhost gloo.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
Prints "LOSS <value>" and "PSUM <value>" on success.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# This image's sitecustomize registers the axon TPU plugin and overrides
# JAX_PLATFORMS, so pin CPU via config (same trick as tests/conftest.py);
# CPU cross-process collectives need the gloo implementation.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from bundlesdf_tpu.parallel import distributed  # noqa: E402

assert distributed.init_multihost(f"127.0.0.1:{port}", nproc, pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == 2
assert jax.device_count() == 2 * nproc

# --- cross-process collective sanity: psum over the global mesh ---------
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402

mesh = distributed.global_mesh()
n_dev = jax.device_count()
x = jax.device_put(np.arange(n_dev, dtype=np.float32),
                   NamedSharding(mesh, P("dp")))
s = shard_map(lambda v: jax.lax.psum(v, "dp"), mesh=mesh,
              in_specs=P("dp"), out_specs=P("dp"))(x)
# a global array spans non-addressable devices: read the local shard
print("PSUM", float(np.asarray(s.addressable_shards[0].data)[0]), flush=True)

# --- dp + table-sharded NOF train step over the 2-host mesh --------------
from __graft_entry__ import _build_nof  # noqa: E402
from bundlesdf_tpu.nof import runner as nof_runner  # noqa: E402
from bundlesdf_tpu.parallel import nof_shard  # noqa: E402

n_rand = 4 * n_dev
spec, rcfg, weights, params, rays, c2w, grid = _build_nof(
    n_rand=n_rand, n_samples=8, n_around=4, num_levels=2, finest_res=32,
    log2_hashmap=12, n_march=32, num_frames=4, occ_res=16,
)
st = nof_runner.TrainStatics(
    spec=spec, rcfg=rcfg, weights=weights, n_rand=n_rand, n_step=100,
    trunc=0.01, trunc_start=0.01, trunc_decay_type="", sc_factor=1.0,
)
optimizer = optax.chain(
    optax.GradientTransformation(*nof_runner.clip_by_global_inf_norm(0.1)),
    optax.scale_by_adam(eps=1e-15),
    optax.scale_by_schedule(lambda s: -0.01),
)
tbl = params["table"]
pad = (-tbl.shape[0]) % n_dev
if pad:
    params["table"] = jnp.concatenate(
        [tbl, jnp.zeros((pad, tbl.shape[1]), tbl.dtype)])
opt_state = optimizer.init(params)

with mesh:
    train_step, place = nof_shard.make_dp_train_step(st, optimizer, mesh)
    params_p, opt_p, rays_p, grid_p, c2w_p = place(
        params, opt_state, rays, grid, c2w)
    out_params, out_opt, metrics = train_step(
        params_p, opt_p, 0, jax.random.PRNGKey(0), rays_p,
        jnp.asarray(n_rand, jnp.int32), grid_p, c2w_p,
    )
    loss = float(np.asarray(metrics["loss"].addressable_shards[0].data))
assert np.isfinite(loss), loss
print(f"LOSS {loss:.8f}", flush=True)
