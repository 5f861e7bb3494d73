"""Stage attribution for the OFFLINE refine budget (global_refine is
~5.8 s/step — the weakest headline number; BASELINE.md offline row:
2000 steps, 64+256 samples/ray, 16 levels -> finest 256, 2^22 table).

At that spec ~half the levels are dense (res <= 160) and the rest hashed
(element gathers + one flat element scatter per level).  Measures:

  1. encode fwd at offline shapes (dense+hashed mix)
  2. full encode VJP
  3. hashed-levels-only fwd / VJP (isolate the element path)
  4. dense-levels-only fwd / VJP
  5. flat element scatter at a hashed level's size (the suspected cost:
     1-D scatter destination = size*C rows of width 1 -> slow regime?)
  6. window-2 row scatter into (size, 2)-packed (size/64, 128) variant

float() readback barrier (BASELINE.md methodology).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(label, fn, *args, iters=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:46s}: {ms:9.1f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bundlesdf_tpu.ops import hashgrid

    spec = hashgrid.HashGridSpec(16, 2, 16, 256, 22, layout="cell")
    params = spec.level_params()
    n_dense = sum(1 for p in params if p["dense"])
    print(f"levels: {len(params)} ({n_dense} dense, "
          f"{len(params) - n_dense} hashed); "
          f"finest dense res {max(p['res'] for p in params if p['dense'])}",
          flush=True)

    tab = hashgrid.init_table(jax.random.PRNGKey(0), spec)

    rng = np.random.default_rng(0)
    d = rng.standard_normal((2048, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -d * 2.0
    t = np.linspace(1.2, 2.8, 320)[None, :, None]
    x = jnp.asarray((o[:, None] + d[:, None] * t).reshape(-1, 3).astype(np.float32))
    N = x.shape[0]
    print(f"N = {N}", flush=True)
    g = jax.random.normal(jax.random.PRNGKey(2), (N, spec.out_dim))

    f = lambda x, t: hashgrid.hash_encode_cell(x, t, spec)
    timeit("1. encode fwd (16 lvl offline)", jax.jit(f), x, tab)

    def full_vjp(x, tab, g):
        _, pull = jax.vjp(f, x, tab)
        return pull(g)
    timeit("2. full VJP (both cotangents)", jax.jit(full_vjp), x, tab, g)

    spec_h = hashgrid.HashGridSpec(4, 2, 176, 256, 22, layout="cell")
    tab_h = hashgrid.init_table(jax.random.PRNGKey(0), spec_h)
    g_h = g[:, : spec_h.out_dim]
    fh = lambda x, t: hashgrid.hash_encode_cell(x, t, spec_h)
    assert not any(p["dense"] for p in spec_h.level_params())
    timeit("3a. hashed-only 4-lvl fwd", jax.jit(fh), x, tab_h)

    def vjp_h(x, tab, g):
        _, pull = jax.vjp(fh, x, tab)
        return pull(g)
    timeit("3b. hashed-only 4-lvl VJP", jax.jit(vjp_h), x, tab_h, g_h)

    spec_d = hashgrid.HashGridSpec(4, 2, 16, 128, 22, layout="cell")
    tab_d = hashgrid.init_table(jax.random.PRNGKey(0), spec_d)
    fd = lambda x, t: hashgrid.hash_encode_cell(x, t, spec_d)

    def vjp_d(x, tab, g):
        _, pull = jax.vjp(fd, x, tab)
        return pull(g)
    timeit("4. dense-only 4-lvl VJP (online spec)", jax.jit(vjp_d),
           x, tab_d, g[:, : spec_d.out_dim])

    # 5. the hashed-level flat element scatter in isolation
    size = 1 << 22
    idx16 = [jnp.asarray(rng.integers(0, size * 2, N).astype(np.int32))
             for _ in range(16)]
    con = [jnp.asarray(rng.standard_normal(N).astype(np.float32))
           for _ in range(16)]

    def flat_scatter(idxs, cons):
        return jnp.zeros((size * 2,), jnp.float32).at[
            jnp.concatenate(idxs)].add(jnp.concatenate(cons),
                                       mode="promise_in_bounds")
    timeit("5. flat elem scatter 16N -> (8.4M,)", jax.jit(flat_scatter),
           idx16, con)

    # 6. packed variant: entry e -> row e//64, col-pair (e%64)*2
    h = jnp.asarray(rng.integers(0, size, N).astype(np.int32))
    d2 = jnp.asarray(rng.standard_normal((N, 2)).astype(np.float32))

    def packed2(h, d2):
        row = h // 64
        blk = h % 64
        cols = jnp.arange(128, dtype=jnp.int32)[None, :] // 2
        upd = jnp.where(cols == blk[:, None], jnp.tile(d2, (1, 64)), 0.0)
        return jnp.zeros((size // 64, 128), jnp.float32).at[row].add(
            upd, mode="promise_in_bounds")
    timeit("6. ONE corner packed row scatter (N rows)", jax.jit(packed2),
           h, d2)


if __name__ == "__main__":
    main()
