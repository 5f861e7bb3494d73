"""Micro-attribution of the cell-layout backward (131 ms full VJP):
which slice of the ~94 ms bwd is scatter vs reduce vs elementwise.

Variants measured at the online budget (4 dense levels 16/32/64/128,
N = 393216 ray-correlated points):

  1. per-level row scatters (shipped path) — 4 ops
  2. merged single scatter into one concatenated cache-grad
  3. scatter-only programs per level (isolate level-3's share)
  4. reduce-only (shifted adds) program
  5. d_cols/dx elementwise-only program (no scatter, no reduce)

float() readback barrier (BASELINE.md methodology).
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jnp.sum(leaf)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jnp.sum(leaf)))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:40s}: {ms:9.1f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bundlesdf_tpu.ops import hashgrid

    spec = hashgrid.HashGridSpec(4, 2, 16, 128, 22, layout="cell")
    params = spec.level_params()
    tab = hashgrid.init_table(jax.random.PRNGKey(0), spec)

    rng = np.random.default_rng(0)
    d = rng.standard_normal((2048, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -d * 2.0
    t = np.linspace(1.2, 2.8, 192)[None, :, None]
    x = jnp.asarray((o[:, None] + d[:, None] * t).reshape(-1, 3).astype(np.float32))
    N = x.shape[0]
    g = jax.random.normal(jax.random.PRNGKey(2), (N, spec.out_dim))

    # shipped full bwd via custom VJP
    f = lambda x, t: hashgrid.hash_encode_cell(x, t, spec)
    def full_vjp(x, tab, g):
        _, pull = jax.vjp(lambda tt: f(x, tt), tab)
        return pull(g)[0]
    timeit("full bwd (table cotangent only)", jax.jit(full_vjp), x, tab, g)

    def both_vjp(x, tab, g):
        _, pull = jax.vjp(f, x, tab)
        return pull(g)
    timeit("full bwd (both cotangents)", jax.jit(both_vjp), x, tab, g)

    # precompute cells + d_rows on device once (outside timed region)
    x01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
    cells = []
    d_rows_all = []
    for li, p in enumerate(params):
        pos = x01 * p["scale"] + 0.5
        pg = jnp.floor(pos).astype(jnp.int32)
        frac = pos - jnp.floor(pos)
        R = p["res"]
        cells.append(pg[..., 0] * (R * R) + pg[..., 1] * R + pg[..., 2])
        cols = []
        for c in hashgrid._CORNERS:
            w = jnp.prod(jnp.where(c[None].astype(bool), frac, 1.0 - frac), -1)
            cols.extend([w * g[:, li * 2], w * g[:, li * 2 + 1]])
        d_rows_all.append(jnp.stack(cols, axis=-1))
    cells = [jax.device_put(c) for c in cells]
    d_rows_all = [jax.device_put(r) for r in d_rows_all]

    # scatter-only per level
    for li, p in enumerate(params):
        R = p["res"]
        timeit(f"scatter only level {li} (R={R})",
               jax.jit(lambda c, r, R=R: jnp.zeros((R**3, 16), jnp.float32)
                       .at[c].add(r, mode="promise_in_bounds")),
               cells[li], d_rows_all[li])

    # merged single scatter
    offs = np.cumsum([0] + [p["res"]**3 for p in params])
    total = int(offs[-1])
    def merged(cs, rs):
        idx = jnp.concatenate([c + int(offs[i]) for i, c in enumerate(cs)])
        upd = jnp.concatenate(rs)
        return jnp.zeros((total, 16), jnp.float32).at[idx].add(
            upd, mode="promise_in_bounds")
    timeit("merged single scatter (all levels)", jax.jit(merged),
           cells, d_rows_all)

    # reduce-only
    def reduce_all(dcs):
        return [hashgrid._reduce_cell_cache_grad(dc, p, 2)
                for dc, p in zip(dcs, params)]
    dcs = [jnp.zeros((p["res"]**3, 16), jnp.float32) for p in params]
    timeit("reduce only (all levels)", jax.jit(reduce_all), dcs)

    # elementwise-only (d_cols + dx, no scatter/reduce) — use vjp wrt x only
    def dx_only(x, tab, g):
        _, pull = jax.vjp(lambda xx: f(xx, tab), x)
        return pull(g)[0]
    timeit("dx-only bwd (no table cotangent)", jax.jit(dx_only), x, tab, g)


if __name__ == "__main__":
    main()
