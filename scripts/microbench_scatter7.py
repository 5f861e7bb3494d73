"""Is the big-destination scatter penalty total-size or touched-footprint?

393K row updates of 16 f32, destination (2.1M, 16) = 134 MB:
  a. indices uniform over all 2.1M rows (baseline ~45.8 ms)
  b. indices uniform over first 262K rows  (touched 17 MB)
  c. indices uniform over first 524K rows  (34 MB)
  d. indices uniform over first 1.05M rows (67 MB)
  e. block-clustered: 2048 clusters of 192 consecutive rows (ray-like
     locality), spread over all 2.1M
  f. destination (524K,16)=34MB, full-range idx  (dest-size threshold)
  g. destination (1.05M,16)=67MB, full-range idx
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

    R3 = 128 ** 3
    N = 393216
    rng = np.random.default_rng(0)
    upd = rng.standard_normal((N, 16)).astype(np.float32)
    j_upd = jnp.asarray(upd)

    def scat(dest_rows):
        def f(i, u):
            return jnp.zeros((dest_rows, 16), u.dtype).at[i].add(
                u, mode="promise_in_bounds")
        return jax.jit(f)

    big = scat(R3)
    timeit("a. full-range idx -> 134MB dest", big,
           jnp.asarray(rng.integers(0, R3, N).astype(np.int32)), j_upd)
    timeit("b. idx<262K -> 134MB dest", big,
           jnp.asarray(rng.integers(0, R3 // 8, N).astype(np.int32)), j_upd)
    timeit("c. idx<524K -> 134MB dest", big,
           jnp.asarray(rng.integers(0, R3 // 4, N).astype(np.int32)), j_upd)
    timeit("d. idx<1.05M -> 134MB dest", big,
           jnp.asarray(rng.integers(0, R3 // 2, N).astype(np.int32)), j_upd)

    starts = rng.integers(0, R3 - 192, 2048)
    clustered = (starts[:, None] + np.arange(192)[None]).reshape(-1)
    timeit("e. 2048x192 clustered blocks -> 134MB dest", big,
           jnp.asarray(clustered.astype(np.int32)), j_upd)

    timeit("f. full-range -> (524K,16)=34MB dest", scat(R3 // 4),
           jnp.asarray(rng.integers(0, R3 // 4, N).astype(np.int32)), j_upd)
    timeit("g. full-range -> (1.05M,16)=67MB dest", scat(R3 // 2),
           jnp.asarray(rng.integers(0, R3 // 2, N).astype(np.int32)), j_upd)


if __name__ == "__main__":
    main()
