"""Bisect the NOF train step on the live TPU chip: time each stage of the
hot loop separately so optimization effort lands where the milliseconds are.

Timing uses float() readback as the execution barrier (block_until_ready
returns at dispatch on the tunneled axon backend — see BASELINE.md).

Usage:  python scripts/bisect_nof.py [--layout exact|cell]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _barrier(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def _barrier(out):
    # Reduce on-device THEN read one scalar: np.asarray of a big leaf would
    # ship the whole array through the tunnel and swamp the timing.
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jnp.sum(leaf)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", default="cell")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_nof
    from bundlesdf_tpu.nof import runner as nof_runner, render as nof_render
    from bundlesdf_tpu.ops import hashgrid
    from bundlesdf_tpu.models import nof as nof_model

    spec, rcfg, weights, params, rays, c2w, grid = _build_nof(
        n_rand=2048, n_samples=128, n_around=64, num_levels=4,
        finest_res=128, log2_hashmap=22, n_march=200, num_frames=16, occ_res=64,
    )
    gspec = spec.grid._replace(layout=args.layout)
    spec = spec._replace(grid=gspec)
    table = params["table"]

    n_pts = 2048 * 192
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n_pts, 3), minval=-1.0, maxval=1.0)

    # 1. hash encode forward only
    enc = jax.jit(lambda x, t: hashgrid.encode(x, t, gspec))
    ms = timeit(enc, x, table)
    print(f"hash fwd            : {ms:8.1f} ms   ({n_pts} pts)")

    # 2. hash encode fwd+bwd (both cotangents).  This standalone program has
    # crashed the remote worker twice (train-step VJP is fine) — guard it.
    try:
        encg = jax.jit(jax.grad(lambda x, t: jnp.sum(hashgrid.encode(x, t, gspec)),
                                argnums=(0, 1)))
        ms = timeit(encg, x, table)
        print(f"hash fwd+bwd        : {ms:8.1f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"hash fwd+bwd        : FAILED ({type(e).__name__})")

    # 3. full field fwd (hash + MLP + SH)
    pts3 = x.reshape(2048, 192, 3)
    dirs = jnp.ones((2048, 3)) / np.sqrt(3.0)
    fids = jnp.zeros((2048,), jnp.int32)
    fwd = jax.jit(lambda p: nof_model.nof_forward(p, spec, pts3, dirs, fids))
    ms = timeit(fwd, params)
    print(f"field fwd           : {ms:8.1f} ms")

    # 4. field fwd+bwd
    def floss(p):
        raw, valid = nof_model.nof_forward(p, spec, pts3, dirs, fids)
        return jnp.sum(raw * valid[..., None])
    fg = jax.jit(jax.grad(floss))
    ms = timeit(fg, params)
    print(f"field fwd+bwd       : {ms:8.1f} ms")

    # 5. render_rays only (sampling + field fwd)
    rr = jax.jit(lambda k, p, r: nof_render.render_rays(
        k, p, spec, rcfg, grid, r, jnp.asarray(c2w), 0.01))
    ms = timeit(rr, key, params, jnp.asarray(rays))
    print(f"render_rays fwd     : {ms:8.1f} ms")

    # 6. one full train step (per-step launch)
    st = nof_runner.TrainStatics(
        spec=spec, rcfg=rcfg, weights=weights, n_rand=2048, n_step=500,
        trunc=0.01, trunc_start=0.01, trunc_decay_type="", sc_factor=1.0,
    )
    optimizer = optax.chain(
        optax.GradientTransformation(*nof_runner.clip_by_global_inf_norm(0.1)),
        optax.scale_by_adam(eps=1e-15),
        optax.scale_by_schedule(lambda s: -0.01 * (0.1 ** (s / 500.0))),
    )
    opt_state = optimizer.init(params)
    train_step, _ = nof_runner.make_train_step(st, optimizer)
    pool = jnp.tile(jnp.asarray(rays), (8, 1))
    n_rays = jnp.asarray(pool.shape[0], jnp.int32)

    def one(params, opt_state):
        return train_step(params, opt_state, 0, key, pool, n_rays, grid,
                          jnp.asarray(c2w))
    p2, o2, m = one(params, opt_state)
    _barrier(m["loss"])
    t0 = time.perf_counter()
    for _ in range(5):
        p2, o2, m = one(p2, o2)
    _barrier(m["loss"])
    ms = (time.perf_counter() - t0) / 5 * 1e3
    print(f"full train step     : {ms:8.1f} ms   ({1000.0/ms:.2f} steps/s)")


if __name__ == "__main__":
    main()
