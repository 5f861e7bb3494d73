"""Is the row GATHER source-size sensitive like the scatter destination is
(microbench_scatter7.py)?  393K gathered rows of 16 f32:

  a. from (2.1M, 16) = 134 MB   (the level-3 cell cache)
  b. from (262K, 16) = 16.8 MB  (level-2-sized)
  c. from (4096, 16)            (level-0-sized)
  d. (N, 128) rows from (262K, 128) = 134 MB  (packed-wide trick probe)
  e. elementwise 16x gather from flat (33.5M,) source (element equivalent)
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
    print(f"{label:46s}: {ms:9.1f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    N = 393216
    rng = np.random.default_rng(0)

    for label, rows in (("a. rows from (2.1M,16)", 128 ** 3),
                        ("b. rows from (262K,16)", 1 << 18),
                        ("c. rows from (4096,16)", 4096)):
        src = jnp.asarray(rng.standard_normal((rows, 16)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, rows, N).astype(np.int32))
        timeit(label, jax.jit(lambda s, i: jnp.sum(s[i], axis=-1)), src, idx)

    src = jnp.asarray(rng.standard_normal((1 << 18, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1 << 18, N).astype(np.int32))
    timeit("d. (N,128) rows from (262K,128)",
           jax.jit(lambda s, i: jnp.sum(s[i], axis=-1)), src, idx)

    flat = jnp.asarray(rng.standard_normal(128 ** 3 * 16).astype(np.float32))
    idx = jnp.asarray((rng.integers(0, 128 ** 3, N) * 16).astype(np.int32))

    def elems(s, i):
        acc = 0.0
        for c in range(16):
            acc = acc + s[i + c]
        return acc
    timeit("e. 16 element gathers from flat 134MB", jax.jit(elems), flat, idx)


if __name__ == "__main__":
    main()
