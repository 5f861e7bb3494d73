"""Probe: does XLA row-gather cost scale with SOURCE size on TPU?

bisect_step.py suggests yes (lv0 256KB cache gather ~0 ms in-situ, lv3
134 MB ~7 ms at the same 393K rows).  If a 393K-row gather from a ~10 MB
source is much cheaper than from 134 MB, the forward can gather run-start
rows only (164K from HBM) and re-distribute via a small-source gather.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(label, fn, *args, iters=10):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0])))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:58s}: {ms:9.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    N = 2048 * 192
    rng = np.random.default_rng(0)
    timeit("Z0 null", jax.jit(lambda v: v + 1.0), jnp.float32(1.0))
    gather = jax.jit(lambda c, i: c[i])
    for rows_log2 in (12, 15, 17, 19, 21):
        rows = 1 << rows_log2
        src = jnp.asarray(rng.standard_normal((rows, 16)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, rows, N).astype(np.int32))
        mb = rows * 16 * 4 / 1e6
        timeit(f"G src 2^{rows_log2} rows ({mb:7.1f} MB), 393K row-gathers",
               gather, src, idx)
    # and the compact two-stage equivalent: 131K from big + 393K from small
    big = jnp.asarray(rng.standard_normal((1 << 21, 16)).astype(np.float32))
    idx_big = jnp.asarray(rng.integers(0, 1 << 21, 2048 * 64).astype(np.int32))
    small_idx = jnp.asarray(rng.integers(0, 2048 * 64, N).astype(np.int32))

    @jax.jit
    def two_stage(big, idx_big, small_idx):
        compact = big[idx_big]
        return compact[small_idx]
    timeit("G two-stage: 131K big + 393K small", two_stage, big, idx_big,
           small_idx)


if __name__ == "__main__":
    main()
