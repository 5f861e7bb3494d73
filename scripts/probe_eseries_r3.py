"""E-series: cumulative step bisect, each stage in its own process
(VARIANT=E1|E2|E3|E4) to defeat jax tracing caches.

  E1  batch sample + sample_z_vals + pts transform + opt on unrelated grads
  E2  E1 + hash encode fwd+bwd (loss = sum(emb^2))
  E3  E2 + MLP fwd+bwd
  E4  full shipped loss (= A)
Deltas give the composed cost of each stage.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_nof
    from bundlesdf_tpu.nof import runner as nof_runner
    from bundlesdf_tpu.nof import render as nof_render
    from bundlesdf_tpu.nof import losses as nof_losses
    from bundlesdf_tpu.models import nof as nof_model
    from bundlesdf_tpu.ops import hashgrid

    spec, rcfg, weights, params, rays, c2w, grid = _build_nof(
        n_rand=2048, n_samples=128, n_around=64, num_levels=4,
        finest_res=128, log2_hashmap=22, n_march=200, num_frames=16,
        occ_res=64,
    )
    spec = spec._replace(grid=spec.grid._replace(scatter="seg"))
    optimizer = optax.chain(
        optax.GradientTransformation(*nof_runner.clip_by_global_inf_norm(0.1)),
        optax.scale_by_adam(eps=1e-15),
        optax.scale_by_schedule(lambda s: -0.01 * (0.1 ** (s / 500.0))),
    )
    opt_state = optimizer.init(params)
    pool = jnp.tile(rays, (8, 1))
    n_rays_total = jnp.asarray(pool.shape[0], jnp.int32)
    key = jax.random.PRNGKey(0)
    variant = os.environ["VARIANT"]

    def render_prefix(params, kr, batch, stage):
        rays_d = batch[:, nof_render.RAY_DIR]
        frame_ids = batch[:, nof_render.RAY_FRAME_ID].astype(jnp.int32)
        depth = batch[:, nof_render.RAY_DEPTH]
        dir_norm = jnp.linalg.norm(rays_d, axis=-1)
        viewdirs = rays_d / dir_norm[:, None]
        tf = c2w[frame_ids]
        corr = nof_model.pose_array_matrices(params["pose_array"], spec, frame_ids)
        tf = corr @ tf
        rays_o_w = tf[:, :3, 3]
        dirs_w = jnp.einsum("nij,nj->ni", tf[:, :3, :3], viewdirs)
        z_vals, hit = nof_render.sample_z_vals(
            kr, rcfg, grid, rays_o_w, dirs_w, dir_norm, depth, 0.01)
        pts_cam = rays_d[:, None, :] * z_vals[..., None]
        pts_w = jnp.einsum("nij,nsj->nsi", tf[:, :3, :3], pts_cam) + tf[:, None, :3, 3]
        if stage == 1:
            return jnp.sum(pts_w ** 2) * 1e-6
        N, S = pts_w.shape[:2]
        flat = pts_w.reshape(-1, 3)
        emb = hashgrid.encode(flat, params["table"], spec.grid, n_rays=N)
        if stage == 2:
            return jnp.sum(emb ** 2) * 1e-3
        h = nof_model._mlp_sigma(params["sigma"], emb)
        sdf = h[:, :1]
        geo = h[:, 1:]
        from bundlesdf_tpu.ops import sh
        dirs_emb = sh.sh_encode(viewdirs, spec.sh_degree)
        dirs_flat = jnp.broadcast_to(dirs_emb[:, None, :], (N, S, dirs_emb.shape[-1]))
        c_in = jnp.concatenate([dirs_flat.reshape(N * S, -1), geo], axis=-1)
        rgb = nof_model._mlp_color(params["color"], c_in)
        return jnp.sum(rgb ** 2) * 1e-6 + jnp.sum(sdf ** 2) * 1e-6

    if variant == "E4":
        st = nof_runner.TrainStatics(
            spec=spec, rcfg=rcfg, weights=weights, n_rand=2048, n_step=500,
            trunc=0.01, trunc_start=0.01, trunc_decay_type="", sc_factor=1.0,
        )
        step, _ = nof_runner.make_train_step(st, optimizer)
    else:
        stage = int(variant[1])

        def loss_fn(params, kr, batch):
            return render_prefix(params, kr, batch, stage)

        @jax.jit
        def step(params, opt_state, i, key, pool, n_rays, grid_, c2w_):
            kb, kr = jax.random.split(jax.random.fold_in(key, i))
            idx = jax.random.randint(kb, (2048,), 0, jnp.maximum(n_rays, 1))
            batch = pool[idx]
            loss, grads = jax.value_and_grad(loss_fn)(params, kr, batch)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss}

    p, o, m = step(params, opt_state, 0, key, pool, n_rays_total, grid, c2w)
    float(m["loss"])
    t0 = time.perf_counter()
    N_IT = 20
    for i in range(N_IT):
        p, o, m = step(p, o, i + 1, key, pool, n_rays_total, grid, c2w)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / N_IT * 1e3
    print(f"{variant}: {dt:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
