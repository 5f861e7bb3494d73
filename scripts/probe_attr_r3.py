"""Round-3 session-2: full in-situ attribution of the 53 ms online train step.

Each variant runs in its OWN process (jax linear_util caches traced
custom-vjp jaxprs by (fn, avals) — same-process monkeypatched variants
silently reuse the old backward; see BASELINE.md 2026-08-19).

Variants:
  full       shipped step (scatter='seg')
  fwd        loss value only (no grad, no optimizer)
  notable    stop_gradient on the hash table (kills cache scatter+reduce+bwd)
  nodx       stop_gradient on encode input (kills dx path)
  nomarch    uniform near..far z sampling (kills occupancy march + CDF)
  sgd        plain SGD instead of the adam chain (isolates optimizer)
  nomlp      sigma/color MLPs replaced by cheap linear reads (isolates MLPs)
  lv3h19     level-3 hashed at 2^19 (candidate: smaller table+cache)
  lv3h20     level-3 hashed at 2^20
"""
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARIANTS = ["full", "fwd", "notable", "nodx", "nomarch", "sgd", "nomlp",
            "lv3h19", "lv3h20"]


def run_variant(name):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_nof
    from bundlesdf_tpu.nof import runner as nof_runner
    from bundlesdf_tpu.nof import render as nof_render
    from bundlesdf_tpu.ops import hashgrid as hg
    from bundlesdf_tpu.ops import occupancy as occ_ops

    log2 = {"lv3h19": 19, "lv3h20": 20}.get(name, 22)
    spec, rcfg, weights, params, rays, c2w, grid = _build_nof(
        n_rand=2048, n_samples=128, n_around=64, num_levels=4,
        finest_res=128, log2_hashmap=log2, n_march=200, num_frames=16,
        occ_res=64,
    )

    if name == "notable":
        orig = hg.encode
        hg.encode = lambda x, t, s, n_rays=None: orig(
            x, jax.lax.stop_gradient(t), s, n_rays=n_rays)
    elif name == "nodx":
        orig = hg.encode
        hg.encode = lambda x, t, s, n_rays=None: orig(
            jax.lax.stop_gradient(x), t, s, n_rays=n_rays)
    elif name == "nomarch":
        def uniform_z(key, cfg, grid, rays_o_w, dirs_unit_w, dir_norm_cam,
                      depth, truncation):
            n = rays_o_w.shape[0]
            s = cfg.n_samples + cfg.n_samples_around_depth
            z = jnp.linspace(cfg.near, cfg.far, s)
            z = jnp.broadcast_to(z, (n, s))
            return z, jnp.ones((n,), bool)
        nof_render.sample_z_vals = uniform_z
    elif name == "nomlp":
        from bundlesdf_tpu.models import nof as nof_model
        nof_model._mlp_sigma = lambda p, e: jnp.pad(
            e[:, :1], ((0, 0), (0, 15 + 1 - 1)))
        nof_model._mlp_color = lambda p, h: h[:, :3]

    st = nof_runner.TrainStatics(
        spec=spec, rcfg=rcfg, weights=weights, n_rand=2048, n_step=500,
        trunc=0.01, trunc_start=0.01, trunc_decay_type="", sc_factor=1.0,
    )
    if name == "sgd":
        optimizer = optax.sgd(1e-2)
    else:
        optimizer = optax.chain(
            optax.GradientTransformation(*nof_runner.clip_by_global_inf_norm(0.1)),
            optax.scale_by_adam(eps=1e-15),
            optax.scale_by_schedule(lambda s: -0.01 * (0.1 ** (s / 500.0))),
        )
    opt_state = optimizer.init(params)
    pool = jnp.tile(rays, (8, 1))
    n_rays = jnp.asarray(pool.shape[0], jnp.int32)
    key = jax.random.PRNGKey(0)

    if name == "fwd":
        loss_fn = nof_runner.make_loss_fn(st)

        @jax.jit
        def step(params, opt_state, i, key, pool, n_rays, grid, c2w):
            kb, kr = jax.random.split(jax.random.fold_in(key, i))
            idx = jax.random.randint(kb, (st.n_rand,), 0,
                                     jnp.maximum(n_rays, 1))
            _, m = loss_fn(params, kr, pool[idx], grid, c2w, i)
            return params, opt_state, m
    else:
        step, _ = nof_runner.make_train_step(st, optimizer)

    p, o, m = step(params, opt_state, 0, key, pool, n_rays, grid, c2w)
    l0 = float(m["loss"])
    t0 = time.perf_counter()
    N_IT = 20
    for i in range(N_IT):
        p, o, m = step(p, o, i + 1, key, pool, n_rays, grid, c2w)
    lN = float(m["loss"])
    dt = (time.perf_counter() - t0) / N_IT * 1e3
    print(f"RESULT {name:10s} {dt:8.2f} ms/step ({1000/dt:6.2f}/s) "
          f"loss {l0:.4f} -> {lN:.4f}", flush=True)


def main():
    for v in VARIANTS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), v],
            capture_output=True, text=True, timeout=900,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
                break
        else:
            err = (proc.stderr or "").strip().splitlines()
            print(f"RESULT {v:10s} FAILED: {err[-1] if err else '?'}",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in VARIANTS:
        run_variant(sys.argv[1])
    else:
        main()
