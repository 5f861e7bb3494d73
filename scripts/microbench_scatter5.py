"""Scatter cost model at the level-3 shape (the 45.8 ms of the cell bwd):
393216 update rows of 16 f32 into a (128^3 = 2.097M, 16) destination.

Variants:
  a. baseline: random indices w/ collisions, promise_in_bounds
  b. truly-unique indices + unique_indices=True
  c. unique indices WITHOUT the flag (isolate flag vs distribution)
  d. sorted indices (with collisions), no flag
  e. sorted + unique + flag
  f. packed destination (R^3/8, 128): 2-D lax.scatter_add of (1,16) windows
  g. bf16 destination + updates
  h. smaller row width: (R^3, 8) x2  (row-width effect)
  i. argsort cost of the 393K index vector (to price a sort-based path)
  j. sort-permuted full pipeline: argsort + row-permute gather + sorted scatter

float() readback barrier per BASELINE.md methodology.
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
    float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s}: {ms:9.1f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    R3 = 128 ** 3
    N = 393216
    rng = np.random.default_rng(0)
    # collision profile like real rays: mostly distinct, some repeats
    idx_rand = rng.integers(0, R3, N).astype(np.int32)
    idx_uniq = rng.permutation(R3)[:N].astype(np.int32)
    idx_sorted = np.sort(idx_rand).astype(np.int32)
    idx_uniq_sorted = np.sort(idx_uniq).astype(np.int32)
    upd = rng.standard_normal((N, 16)).astype(np.float32)

    j_rand = jnp.asarray(idx_rand)
    j_uniq = jnp.asarray(idx_uniq)
    j_sorted = jnp.asarray(idx_sorted)
    j_us = jnp.asarray(idx_uniq_sorted)
    j_upd = jnp.asarray(upd)

    def scat(i, u, unique=False):
        return jnp.zeros((R3, 16), u.dtype).at[i].add(
            u, mode="promise_in_bounds", unique_indices=unique)

    timeit("a. random+collisions (baseline)", jax.jit(lambda i, u: scat(i, u)), j_rand, j_upd)
    timeit("b. unique + flag", jax.jit(lambda i, u: scat(i, u, True)), j_uniq, j_upd)
    timeit("c. unique, no flag", jax.jit(lambda i, u: scat(i, u)), j_uniq, j_upd)
    timeit("d. sorted w/ collisions, no flag", jax.jit(lambda i, u: scat(i, u)), j_sorted, j_upd)
    timeit("e. sorted unique + flag", jax.jit(lambda i, u: scat(i, u, True)), j_us, j_upd)

    # f. packed 2-D scatter: dest (R3//8, 128), window (1,16) at (r, c)
    def packed(i, u):
        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1),
        )
        sidx = jnp.stack([i // 8, (i % 8) * 16], axis=-1)
        return lax.scatter_add(
            jnp.zeros((R3 // 8, 128), u.dtype), sidx, u[:, None, :], dn,
            indices_are_sorted=False, unique_indices=False,
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    timeit("f. packed (R3/8,128) 2-D scatter", jax.jit(packed), j_rand, j_upd)

    timeit("g. bf16 dest+updates", jax.jit(lambda i, u: scat(i, u.astype(jnp.bfloat16))), j_rand, j_upd)

    def two_halves(i, u):
        a = jnp.zeros((R3, 8), u.dtype).at[i].add(u[:, :8], mode="promise_in_bounds")
        b = jnp.zeros((R3, 8), u.dtype).at[i].add(u[:, 8:], mode="promise_in_bounds")
        return a, b
    timeit("h. two (R3,8) scatters", jax.jit(two_halves), j_rand, j_upd)

    timeit("i. argsort(393K int32)", jax.jit(lambda i: jnp.argsort(i)), j_rand)

    def sort_pipeline(i, u):
        perm = jnp.argsort(i)
        return jnp.zeros((R3, 16), u.dtype).at[i[perm]].add(
            u[perm], mode="promise_in_bounds", indices_are_sorted=True)
    timeit("j. argsort+permute+sorted scatter", jax.jit(sort_pipeline), j_rand, j_upd)


if __name__ == "__main__":
    main()
