"""Measure the pallas matmul-shift cache-grad reduce vs the shipped conv
reduce on the real chip, at the big dense level shapes (R=64, 128; C=2).

Timing (ADVICE r4 #5 — describe what is actually measured): a plain loop
of ``iters`` independent dispatches with one trailing block_until_ready,
best of ``reps``.  Per-dispatch overhead is amortized over the loop but
NOT subtracted — the numbers are comparable between the two engines (same
overhead both sides), not absolute in-program costs.  The in-situ step
deltas recorded in BASELINE.md are the authoritative measurements.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bundlesdf_tpu.ops.hashgrid import _reduce_cell_cache_grad_conv
from bundlesdf_tpu.ops.reduce_pallas import reduce_cell_cache_grad_pallas


def bench(fn, x, iters=20, reps=3):
    fn(x).block_until_ready()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    for R in (64, 128):
        C = 2
        S = R + 1
        p = {"res": R, "size": S * S * S}
        rng = np.random.default_rng(0)
        d_cache = jnp.asarray(
            rng.standard_normal((R * R * R, 8 * C), np.float32),
            jnp.bfloat16)

        conv = jax.jit(lambda x: _reduce_cell_cache_grad_conv(x, p, C))
        pal = jax.jit(lambda x: reduce_cell_cache_grad_pallas(x, R=R, C=C))

        a = np.asarray(conv(d_cache), np.float32)
        b = np.asarray(pal(d_cache), np.float32)
        exact = bool(np.array_equal(a, b))
        t_conv = bench(conv, d_cache)
        t_pal = bench(pal, d_cache)
        mb = d_cache.size * 2 / 1e6
        print(f"R={R} C={C} cache={mb:.0f}MB exact={exact} "
              f"conv={t_conv:.2f}ms pallas={t_pal:.2f}ms "
              f"speedup={t_conv / t_pal:.2f}x", flush=True)


if __name__ == "__main__":
    main()
