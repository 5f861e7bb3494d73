"""Focused measurement of the cell-layout hash encode on the live chip.

Ray-correlated sample points (what the train step actually feeds the
encoder: 192 samples marching along each of 2048 rays) instead of
bisect_nof's uniform-random x — gather locality differs by ~3x and the
train loop's behavior is the correlated one.

Order: cheap/safe programs first, the full-scale VJP (which crashed the
remote worker once) LAST, so a crash still yields the other numbers.

float() readback as the barrier (BASELINE.md methodology).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(label, fn, *args, iters=5):
    import jax

    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:34s}: {ms:9.1f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bundlesdf_tpu.ops import hashgrid

    spec = hashgrid.HashGridSpec(4, 2, 16, 128, 22)
    espec = spec._replace(layout="exact")
    cspec = spec._replace(layout="cell")
    tab = hashgrid.init_table(jax.random.PRNGKey(0), spec)

    # ray-correlated points: 2048 rays from sphere surface toward center,
    # 192 samples in [0.6, 1.4] ray depth — mirrors render_rays output
    rng = np.random.default_rng(0)
    d = rng.standard_normal((2048, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -d * 2.0
    t = np.linspace(1.2, 2.8, 192)[None, :, None]
    x_corr = jnp.asarray((o[:, None] + d[:, None] * t).reshape(-1, 3).astype(np.float32))
    x_rand = jax.random.uniform(jax.random.PRNGKey(1), x_corr.shape,
                                minval=-1.0, maxval=1.0)
    print(f"N = {x_corr.shape[0]}", flush=True)

    enc_e = jax.jit(lambda x, t: jnp.sum(hashgrid.encode(x, t, espec)))
    enc_c = jax.jit(lambda x, t: jnp.sum(hashgrid.encode(x, t, cspec)))

    # 1. tiny-scale VJP executes at all (worker crashed on full-scale once)
    g_c = jax.jit(jax.grad(lambda x, t: jnp.sum(
        jnp.sin(hashgrid.encode(x, t, cspec))), argnums=(0, 1)))
    timeit("cell vjp tiny (4K pts)", g_c, x_corr[:4096], tab, iters=2)

    # 2. forwards, correlated vs random
    timeit("exact fwd corr", enc_e, x_corr, tab)
    timeit("cell  fwd corr", enc_c, x_corr, tab)
    timeit("exact fwd rand", enc_e, x_rand, tab)
    timeit("cell  fwd rand", enc_c, x_rand, tab)

    # 3. full-scale VJPs (risky one last)
    g_e = jax.jit(jax.grad(lambda x, t: jnp.sum(
        jnp.sin(hashgrid.encode(x, t, espec))), argnums=(0, 1)))
    timeit("exact vjp corr", g_e, x_corr, tab)
    timeit("cell  vjp corr", g_c, x_corr, tab)


if __name__ == "__main__":
    main()
