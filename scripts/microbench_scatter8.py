"""Is the scatter regime threshold on destination ROWS or BYTES?
microbench_gather5 showed gathers cost per-row, width-free to 128 lanes.

  a. (N,16) rows -> (262K,16) = 16.8MB   [known fast, 12.1 ms]
  b. (N,128) rows -> (262K,128) = 134MB  [same bytes as the slow (2.1M,16)]
  c. (N,128) rows -> (2.1M/16=131K,128)
  d. (N,32) rows -> (1.05M,32) = 134MB   [another width/row mix]
  e. in-situ level-3 shape: masked (N,128) update construction + scatter
     into (262K,128) (what the packed bwd would actually run)
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
    print(f"{label:48s}: {ms:9.1f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    N = 393216
    rng = np.random.default_rng(0)
    R3 = 128 ** 3

    def scat(rows, width):
        def f(i, u):
            return jnp.zeros((rows, width), u.dtype).at[i].add(
                u, mode="promise_in_bounds")
        return jax.jit(f)

    u16 = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
    u32 = jnp.asarray(rng.standard_normal((N, 32)).astype(np.float32))
    u128 = jnp.asarray(rng.standard_normal((N, 128)).astype(np.float32))

    timeit("a. (N,16) -> (262K,16)", scat(1 << 18, 16),
           jnp.asarray(rng.integers(0, 1 << 18, N).astype(np.int32)), u16)
    timeit("b. (N,128) -> (262K,128)", scat(1 << 18, 128),
           jnp.asarray(rng.integers(0, 1 << 18, N).astype(np.int32)), u128)
    timeit("c. (N,128) -> (131K,128)", scat(1 << 17, 128),
           jnp.asarray(rng.integers(0, 1 << 17, N).astype(np.int32)), u128)
    timeit("d. (N,32) -> (1.05M,32)", scat(1 << 20, 32),
           jnp.asarray(rng.integers(0, 1 << 20, N).astype(np.int32)), u32)

    cell = jnp.asarray(rng.integers(0, R3, N).astype(np.int32))

    def packed_insitu(cell, u):
        # the real packed bwd: place each point's 16 values in column
        # block (cell % 8) * 16 of a 128-wide row, scatter at cell // 8
        row = cell // 8
        blk = cell % 8
        cols = jnp.arange(128, dtype=jnp.int32)[None, :]
        src = jnp.tile(u, (1, 8))
        upd = jnp.where((cols // 16) == blk[:, None], src, 0.0)
        return jnp.zeros((R3 // 8, 128), u.dtype).at[row].add(
            upd, mode="promise_in_bounds")
    timeit("e. in-situ packed level-3 (mask+scatter)",
           jax.jit(packed_insitu), cell, u16)


if __name__ == "__main__":
    main()
