"""Data-parallel + table-sharded NOF training step.

The multi-chip version of nof/runner.make_train_step: the ray batch is
sharded over the ``dp`` mesh axis and the hash-grid table rows over the
same devices (index-sharded embedding — the gather/scatter-add cross in the
backward pass becomes XLA all-to-all/psum collectives inserted by GSPMD).
Parameters other than the table are replicated; the Adam update is
computed identically on every device.

This is the TPU answer to the reference's single-GPU torch loop +
nothing-else (SURVEY.md §2.5): NOF rays scale data-parallel over chips and
the map (hash table) scales with table sharding, over ICI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nof import runner as nof_runner


def make_dp_train_step(st: nof_runner.TrainStatics, optimizer, mesh: Mesh,
                       shard_table: bool = True):
    """Build a jitted multi-device training step over ``mesh`` (axis 'dp').

    Same signature/semantics as nof/runner.make_train_step's product, plus
    sharding annotations:
      * the sampled ray batch is constrained to P('dp') on axis 0;
      * params['table'] is constrained to P('dp') rows when shard_table.
    """
    base_step_impl, _ = _make_impl(st, optimizer, mesh, shard_table)
    table_spec = P("dp") if shard_table else P()  # table is flat 1-D

    def place(params, opt_state, rays, grid, c2w):
        """Device-place state according to the step's shardings."""
        repl = NamedSharding(mesh, P())
        params = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), params)
        if shard_table:
            params["table"] = jax.device_put(
                params["table"], NamedSharding(mesh, table_spec)
            )
        opt_state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), opt_state)
        rays = jax.device_put(rays, repl)
        grid = jax.device_put(grid, repl)
        c2w = jax.device_put(c2w, repl)
        return params, opt_state, rays, grid, c2w

    return base_step_impl, place


def _make_impl(st: nof_runner.TrainStatics, optimizer, mesh: Mesh, shard_table: bool):
    import optax

    batch_sharding = NamedSharding(mesh, P("dp", None))
    table_sharding = NamedSharding(mesh, P("dp") if shard_table else P())

    # THE loss: shared with the single-device path (nof/runner.make_loss_fn)
    # so every optional term (depth/fs-rgb/eikonal/pose-reg) trains the same
    # objective on 1 and N chips.
    grad_fn = jax.value_and_grad(nof_runner.make_loss_fn(st), has_aux=True)

    def step_impl(params, opt_state, step, key, rays, n_rays, grid, c2w):
        if shard_table:
            params = dict(params)
            params["table"] = jax.lax.with_sharding_constraint(
                params["table"], table_sharding
            )
        kb, kr = jax.random.split(jax.random.fold_in(key, step))
        idx = jax.random.randint(kb, (st.n_rand,), 0, jnp.maximum(n_rays, 1))
        batch = rays[idx]
        batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        (_, metrics), grads = grad_fn(params, kr, batch, grid, c2w, step)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return jax.jit(step_impl), step_impl


def make_dp_train_loop(st: nof_runner.TrainStatics, optimizer, mesh: Mesh,
                       shard_table: bool = True):
    """Multi-step multi-device loop: the dp analogue of
    nof/runner.make_train_loop (one launch per n_inner steps), with the
    same (params, opt_state, step0, key, rays, n_rays, grid, c2w, n_inner)
    signature so NofRunner can swap it in transparently."""
    _, step_impl = _make_impl(st, optimizer, mesh, shard_table)

    @partial(jax.jit, static_argnames=("n_inner",), donate_argnums=(0, 1))
    def train_many(params, opt_state, step0, key, rays, n_rays, grid, c2w,
                   n_inner):
        def body(carry, i):
            p, o = carry
            p, o, m = step_impl(p, o, step0 + i, key, rays, n_rays, grid, c2w)
            return (p, o), m

        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_inner))
        return params, opt_state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return train_many
