"""Price the sort-routed chunked scatter for level 3 (microbench_scatter5
showed per-row scatter cost is ~116 ns into a 134 MB destination vs ~31 ns
into <=17 MB, flat in uniqueness/sortedness/dtype — destination residency
is the driver, row count the unit of cost).

Candidate: route updates by cell%8 into 8 compact (R^3/8, 16) destinations
(17 MB each, uniform occupancy since cell%8 = cz%8), then interleave back.

  a. row-count scaling at big dest: 49K/98K/393K rows into (2.1M,16)
  b. row-count scaling at small dest: 61K/393K rows into (262K,16)
  c. argsort by cell%8 (radix-1 key) + row permute (the routing cost)
  d. full routed pipeline: sort key=cell%8, searchsorted boundaries,
     8 masked static-window scatters into (262K,16), interleave reshape
  e. horizontal merge: ONE (N,64) scatter into (2.4M,64) for all 4 levels
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
    print(f"{label:46s}: {ms:9.1f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    R3 = 128 ** 3
    N = 393216
    rng = np.random.default_rng(0)
    cell = rng.integers(0, R3, N).astype(np.int32)
    upd = rng.standard_normal((N, 16)).astype(np.float32)
    j_cell = jnp.asarray(cell)
    j_upd = jnp.asarray(upd)

    def scat(dest_rows):
        def f(i, u):
            return jnp.zeros((dest_rows, 16), u.dtype).at[i].add(
                u, mode="promise_in_bounds")
        return jax.jit(f)

    for n in (49152, 98304, N):
        timeit(f"a. {n} rows -> (2.1M,16)", scat(R3),
               j_cell[:n], j_upd[:n])
    for n in (61440, N):
        timeit(f"b. {n} rows -> (262K,16)", scat(R3 // 8),
               jnp.asarray(cell[:n] // 8), j_upd[:n])

    def route(i, u):
        perm = jnp.argsort(i % 8)
        return i[perm], u[perm]
    timeit("c. argsort(cell%8) + permute rows", jax.jit(route), j_cell, j_upd)

    CAP = 65536  # static per-chunk window (N/8 = 49152, 1.33x slack)

    def routed(i, u):
        key = i % 8
        perm = jnp.argsort(key)
        si = i[perm]
        su = u[perm]
        sk = key[perm]
        starts = jnp.searchsorted(sk, jnp.arange(8))
        chunks = []
        for k in range(8):
            s = starts[k]
            w = jax.lax.dynamic_slice_in_dim(
                jnp.pad(si, (0, CAP)), s, CAP)
            uw = jax.lax.dynamic_slice_in_dim(
                jnp.pad(su, ((0, CAP), (0, 0))), s, CAP)
            inchunk = (w % 8) == k
            pos = jnp.arange(CAP) + s
            valid = inchunk & (pos < N)
            row = jnp.where(valid, w // 8, R3 // 8)  # dump row
            chunks.append(
                jnp.zeros((R3 // 8 + 1, 16), u.dtype).at[row].add(
                    jnp.where(valid[:, None], uw, 0.0),
                    mode="promise_in_bounds")[: R3 // 8])
        d = jnp.stack(chunks, axis=1)  # (262K, 8, 16); cell = r*8+k
        return d.reshape(R3, 16)
    timeit("d. routed pipeline (8 x 64K windows)", jax.jit(routed),
           j_cell, j_upd)

    # e. horizontal merge across levels: one (N,64) scatter
    offs = [0]
    for R in (16, 32, 64):
        offs.append(offs[-1] + R ** 3)
    total = offs[-1] + R3
    cells4 = [rng.integers(0, R ** 3, N).astype(np.int32) + o
              for R, o in zip((16, 32, 64, 128), offs)]
    upd64 = rng.standard_normal((N, 64)).astype(np.float32)

    def merged64(i0, u):
        return jnp.zeros((total, 64), u.dtype).at[i0].add(
            u, mode="promise_in_bounds")
    timeit("e. (N,64) rows -> (2.4M,64) [1 level's idx]",
           jax.jit(merged64), jnp.asarray(cells4[3]), upd64)


if __name__ == "__main__":
    main()
