"""Full phase-level decomposition of the online NOF train step (~109 ms at
9.19 steps/s).  Times every component separately on the live chip so the
next optimization lands where the milliseconds are (BASELINE.md playbook).

Usage: python scripts/bisect_step.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(label, fn, *args, iters=5):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:52s}: {ms:9.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_nof
    from bundlesdf_tpu.nof import runner as nof_runner, render as nof_render
    from bundlesdf_tpu.ops import hashgrid, occupancy as occ_ops
    from bundlesdf_tpu.models import nof as nof_model

    spec, rcfg, weights, params, rays, c2w, grid = _build_nof(
        n_rand=2048, n_samples=128, n_around=64, num_levels=4,
        finest_res=128, log2_hashmap=22, n_march=200, num_frames=16,
        occ_res=64,
    )
    gspec = spec.grid._replace(layout="cell")
    spec = spec._replace(grid=gspec)
    table = params["table"]
    C = gspec.level_dim
    key = jax.random.PRNGKey(0)
    rays_j = jnp.asarray(rays)
    c2w_j = jnp.asarray(c2w)

    N_RAYS, S = 2048, 192
    n_pts = N_RAYS * S
    x = jax.random.uniform(key, (n_pts, 3), minval=-0.8, maxval=0.8)

    # ---- 0. launch-overhead floor: a trivial program, same barrier ----
    # Standalone per-op timings include one full tunnel dispatch; this
    # number is what to subtract to estimate the op's in-situ cost.
    timeit("Z0 null program (x+1 on a scalar)",
           jax.jit(lambda v: v + 1.0), jnp.float32(1.0))

    # ---- A. sampling ----
    rb = rays_j[:N_RAYS]
    rd = rb[:, nof_render.RAY_DIR]
    dirn = jnp.linalg.norm(rd, axis=-1)
    vd = rd / dirn[:, None]
    tf = c2w_j[rb[:, nof_render.RAY_FRAME_ID].astype(jnp.int32)]
    ro_w = tf[:, :3, 3]
    rdw = jnp.einsum("nij,nj->ni", tf[:, :3, :3], vd)
    depth = rb[:, nof_render.RAY_DEPTH]

    timeit("A1 march only (409K grid probes)",
           jax.jit(lambda g, o, d: occ_ops._march_occupancy(g, o, d, 200)[0]),
           grid, ro_w, rdw)
    timeit("A2 sample_z_vals (march + 2 CDF inversions + band)",
           jax.jit(lambda k, g, o, d, dn, de: nof_render.sample_z_vals(
               k, rcfg, g, o, d, dn, de, 0.01)),
           key, grid, ro_w, rdw, dirn, depth)

    # ---- B. forward encode parts ----
    views = hashgrid._level_views(table, gspec)
    axes = hashgrid._axes01(x)
    lps = gspec.level_params()
    caches = []
    for li, (p, v) in enumerate(zip(lps, views)):
        ms = timeit(f"B1 cache build level {li} (R={p['res']})",
                    jax.jit(lambda v, p=p: hashgrid._build_cell_cache(v, p, C)), v)
        caches.append(hashgrid._build_cell_cache(v, p, C))
    cells = []
    for li, p in enumerate(lps):
        pgs, _ = hashgrid._level_fracs(axes, p)
        cells.append(hashgrid._cell_of(pgs, p["res"]))
    for li, p in enumerate(lps):
        timeit(f"B2 row gather level {li}",
               jax.jit(lambda c, i: c[i]), caches[li], cells[li])
    timeit("B3 full encode fwd (all levels)",
           jax.jit(lambda x, t: hashgrid.encode(x, t, gspec)), x, table)

    # ---- C. backward parts ----
    rng = np.random.default_rng(0)
    d_rows = jnp.asarray(rng.standard_normal((n_pts, 8 * C)).astype(np.float32))
    for li, p in enumerate(lps):
        R3 = p["res"] ** 3
        timeit(f"C1 scatter level {li} (dest {R3} rows)",
               jax.jit(lambda cell, dr, R3=R3: hashgrid._cell_cache_scatter(
                   cell, dr, R3)), cells[li], d_rows)
    for li, p in enumerate(lps):
        dc = jnp.asarray(
            rng.standard_normal((p["res"] ** 3, 8 * C)).astype(np.float32))
        timeit(f"C2 cache-grad reduce level {li}",
               jax.jit(lambda d, p=p: hashgrid._reduce_cell_cache_grad(d, p, C)),
               dc)
    # grouped single-program versions (amortize the launch overhead the
    # way the real train step does)
    def all_builds(t):
        return [hashgrid._build_cell_cache(v, p, C)
                for p, v in zip(lps, hashgrid._level_views(t, gspec))]
    timeit("B1g all 4 cache builds (one program)", jax.jit(all_builds), table)

    @jax.jit
    def all_gathers(*args):
        cs, idxs = args[:4], args[4:]
        return [c[i] for c, i in zip(cs, idxs)]
    timeit("B2g all 4 row gathers (one program)", all_gathers,
           *caches, *cells)

    @jax.jit
    def all_scatters(dr, *cells_):
        return [hashgrid._cell_cache_scatter(cell, dr, p["res"] ** 3)
                for cell, p in zip(cells_, lps)]
    timeit("C1g all 4 scatters (one program)", all_scatters, d_rows, *cells)

    @jax.jit
    def all_reduces(*dcs):
        return [hashgrid._reduce_cell_cache_grad(dc, p, C)
                for dc, p in zip(dcs, lps)]
    dcs = [jnp.asarray(rng.standard_normal((p["res"] ** 3, 8 * C)).astype(np.float32))
           for p in lps]
    timeit("C2g all 4 reduces (one program, pad-add)", all_reduces, *dcs)

    g_out = jnp.asarray(
        rng.standard_normal((n_pts, gspec.out_dim)).astype(np.float32))

    def table_bwd(x, tab, g):
        _, pull = jax.vjp(lambda t: hashgrid.hash_encode_cell(x, t, gspec), tab)
        return pull(g)[0]
    timeit("C3 encode bwd table-only", jax.jit(table_bwd), x, table, g_out)

    def full_bwd(x, tab, g):
        _, pull = jax.vjp(
            lambda xx, t: hashgrid.hash_encode_cell(xx, t, gspec), x, tab)
        return pull(g)
    timeit("C4 encode bwd both cotangents", jax.jit(full_bwd), x, table, g_out)

    # ---- D. MLP ----
    emb = jnp.asarray(rng.standard_normal((n_pts, gspec.out_dim)).astype(np.float32))
    dirs_emb = jnp.asarray(rng.standard_normal(
        (n_pts, spec.input_ch_views)).astype(np.float32))

    def mlp(params, emb, dirs_emb):
        h = nof_model._mlp_sigma(params["sigma"], emb)
        cin = jnp.concatenate([dirs_emb, h[:, 1:]], axis=-1)
        return nof_model._mlp_color(params["color"], cin), h[:, 0]
    timeit("D1 MLP fwd (393K pts)", jax.jit(mlp), params, emb, dirs_emb)

    def mlp_loss(params, emb, dirs_emb):
        rgb, sdf = mlp(params, emb, dirs_emb)
        return jnp.sum(rgb) + jnp.sum(sdf)
    timeit("D2 MLP fwd+bwd", jax.jit(jax.grad(mlp_loss)), params, emb, dirs_emb)

    # ---- E. optimizer ----
    optimizer = optax.chain(
        optax.GradientTransformation(*nof_runner.clip_by_global_inf_norm(0.1)),
        optax.scale_by_adam(eps=1e-15),
        optax.scale_by_schedule(lambda s: -0.01 * (0.1 ** (s / 500.0))),
    )
    opt_state = optimizer.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def opt_step(grads, opt_state, params):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates)
    timeit("E1 optimizer update (9.8M params)", opt_step, grads, opt_state, params)

    # ---- F. render fwd + full step (anchors) ----
    timeit("F1 render_rays fwd",
           jax.jit(lambda k, p, r: nof_render.render_rays(
               k, p, spec, rcfg, grid, r, c2w_j, 0.01)),
           key, params, rb)
    st = nof_runner.TrainStatics(
        spec=spec, rcfg=rcfg, weights=weights, n_rand=2048, n_step=500,
        trunc=0.01, trunc_start=0.01, trunc_decay_type="", sc_factor=1.0,
    )
    train_step, _ = nof_runner.make_train_step(st, optimizer)
    pool = jnp.tile(rays_j, (8, 1))
    n_rays = jnp.asarray(pool.shape[0], jnp.int32)
    timeit("F2 full train step",
           lambda p, o: train_step(p, o, 0, key, pool, n_rays, grid, c2w_j),
           params, opt_state)

    pspec = spec._replace(grid=gspec._replace(scatter="pallas"))
    stp = st._replace(spec=pspec)
    train_step_p, _ = nof_runner.make_train_step(stp, optimizer)
    timeit("F3 full train step (pallas fused scatter lv0+1)",
           lambda p, o: train_step_p(p, o, 0, key, pool, n_rays, grid, c2w_j),
           params, opt_state)


if __name__ == "__main__":
    main()
