"""Microbench: dense-level corner fetch strategies at the online budget.

Question: can the forward skip the 134 MB level-3 cell-cache build by
gathering (2,2,2,C) corner blocks straight from the (S,S,S,C) table view?

  A) cell cache: build (R^3, 8C) corner-duplicated cache (dense slices)
     + one (N, 8C) row gather                      [current fwd path]
  B) block gather: one lax.gather with slice_sizes=(2,2,2,C) from the
     (S,S,S,C) view -> (N,2,2,2,C)                  [no cache build]
  C) row-pair gather: 4 window gathers of contiguous (2*C,) at the 4
     (gx,gy) corner columns (z-adjacent corners are contiguous)
  D) cache gather only (cache prebuilt)             [lower bound for A]

Run on the TPU chip: python scripts/microbench_blockgather.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

R = 128          # level-3 resolution at the online budget
S = R + 1
C = 2
N = 393_216      # 2048 rays x 192 samples


def barrier(x):
    float(np.asarray(jnp.sum(x)))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    barrier(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(S * S * S * C,)).astype(np.float32))
    gx = jnp.asarray(rng.integers(0, R, N).astype(np.int32))
    gy = jnp.asarray(rng.integers(0, R, N).astype(np.int32))
    gz = jnp.asarray(rng.integers(0, R, N).astype(np.int32))

    from bundlesdf_tpu.ops import hashgrid

    p = {"res": R, "size": S * S * S, "dense": True, "offset": 0, "scale": R}

    @jax.jit
    def a_cache_and_gather(table, gx, gy, gz):
        cache = hashgrid._build_cell_cache(table, p, C)
        cell = gx * (R * R) + gy * R + gz
        return cache[cell].T

    @jax.jit
    def b_block_gather(table, gx, gy, gz):
        t4 = table.reshape(S, S, S, C)
        starts = jnp.stack([gx, gy, gz], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2))
        out = jax.lax.gather(
            t4, starts, dn, slice_sizes=(2, 2, 2, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return out.reshape(N, 8 * C).T

    @jax.jit
    def c_rowpair_gather(table, gx, gy, gz):
        cols = []
        for cx in (0, 1):
            for cy in (0, 1):
                base = ((gx + cx) * (S * S) + (gy + cy) * S + gz) * C
                pair = hashgrid._window_gather(table, base, 2 * C).T
                cols.append(pair)
        return jnp.concatenate(cols, axis=0)

    cache = jax.jit(lambda t: hashgrid._build_cell_cache(t, p, C))(table)
    cache = jax.block_until_ready(cache)

    @jax.jit
    def d_cache_gather(cache, gx, gy, gz):
        cell = gx * (R * R) + gy * R + gz
        return cache[cell].T

    @jax.jit
    def build_only(table):
        return hashgrid._build_cell_cache(table, p, C)

    print(f"N={N}, level R={R} (S^3*C = {S*S*S*C/1e6:.1f}M f32)")
    print(f"A cache build + row gather : {timeit(a_cache_and_gather, table, gx, gy, gz):8.1f} ms")
    print(f"   cache build only        : {timeit(build_only, table):8.1f} ms")
    print(f"B (2,2,2,C) block gather   : {timeit(b_block_gather, table, gx, gy, gz):8.1f} ms")
    print(f"C 4x row-pair gathers      : {timeit(c_rowpair_gather, table, gx, gy, gz):8.1f} ms")
    print(f"D cache row gather only    : {timeit(d_cache_gather, cache, gx, gy, gz):8.1f} ms")

    # numeric check: B == A (same corner order: _CORNERS is x-major?)
    a = np.asarray(a_cache_and_gather(table, gx[:64], gy[:64], gz[:64]))
    b = np.asarray(b_block_gather(table, gx, gy, gz))[:, :64]
    # _CORNERS order vs block (cx,cy,cz) raster order may differ; compare sets
    print("A/B values match (sorted):",
          np.allclose(np.sort(a, axis=0), np.sort(b, axis=0)))


if __name__ == "__main__":
    main()
