"""Micro-benchmark round 4: cost the corner-duplicated CELL-CACHE design.

The hash-encode step is random-access bound (BASELINE.md): 25.2M element
gathers fwd + 25.2M re-gathers + 25.2M element scatter-adds bwd at the
online budget.  For DENSE levels (all 4 online levels are dense) the 8
corners of a cell are shifted slices of the row-major table, so a
(cells, 16) corner-duplicated cache can be built with pure dense slicing
and the per-point work becomes ONE 16-wide row gather / row scatter-add
per level (1.57M rows vs 25.2M elements).  This measures whether XLA's
row gather/scatter at width 16 (lane-padded 16 -> 128, 8x traffic waste)
is per-ROW cheap enough to win.

Shapes mirror the in-situ online budget: N = 393216 points, biggest level
129^3 = 2.15M cells.  Indices drawn with ray-locality (sorted blocks) to
mimic in-situ correlation.

float() readback as the execution barrier (BASELINE.md methodology).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(label, fn, *args, iters=5):
    out = jax.jit(fn)(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.jit(fn)(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:36s}: {ms:9.1f} ms")
    return ms


def main():
    N = 393_216          # 2048 rays x 192 samples
    C = 2_146_689        # 129^3 cells (biggest online level)
    rng = np.random.default_rng(0)

    # locality-correlated indices: random base per ray, nearby cells along it
    base = rng.integers(0, C - 256, size=(2048, 1))
    off = np.sort(rng.integers(0, 256, size=(2048, 192)), axis=1)
    idx = jnp.asarray((base + off).reshape(-1).astype(np.int32))  # (N,)

    cache16 = jnp.asarray(rng.standard_normal((C, 16)).astype(np.float32))
    flat = jnp.asarray(rng.standard_normal((C * 16,)).astype(np.float32))
    rows = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
    vals = jnp.asarray(rng.standard_normal((N,)).astype(np.float32))

    # --- gathers -----------------------------------------------------------
    bench("row gather (C,16)[idx] -> (N,16)",
          lambda c, i: jnp.sum(c[i], axis=0), cache16, idx)
    # element-gather equivalent work: 16 flat gathers of N (current exact path)
    def elem_gather(f, i):
        acc = 0.0
        for k in range(16):
            acc = acc + f[i * 16 + k]
        return jnp.sum(acc)
    bench("16x element gather (exact-path eq)", elem_gather, flat, idx)

    # --- scatters ----------------------------------------------------------
    bench("row scatter-add (N,16) -> (C,16)",
          lambda r, i: jnp.sum(
              jnp.zeros((C, 16), jnp.float32).at[i].add(r,
                  mode="promise_in_bounds")),
          rows, idx)

    def elem_scatter(v, i):
        out = jnp.zeros((C * 16,), jnp.float32)
        parts_i = [i * 16 + k for k in range(16)]
        parts_v = [v for _ in range(16)]
        return jnp.sum(out.at[jnp.concatenate(parts_i)].add(
            jnp.concatenate(parts_v), mode="promise_in_bounds"))
    bench("16x element scatter (exact-path eq)", elem_scatter, vals, idx)

    # --- cache build / reduce (dense slicing) ------------------------------
    S = 130  # corner grid side for res 129
    tab3 = jnp.asarray(rng.standard_normal((S, S, S, 2)).astype(np.float32))
    R = 129

    def build_cache(t):
        parts = []
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    parts.append(
                        jax.lax.slice(t, (dx, dy, dz, 0),
                                      (dx + R, dy + R, dz + R, 2)))
        return jnp.sum(jnp.concatenate([p.reshape(-1, 2) for p in parts], -1))
    bench("build cell cache 129^3 (8 slices)", build_cache, tab3)

    dcache = jnp.asarray(rng.standard_normal((R * R * R, 16)).astype(np.float32))

    def reduce_cache(dc):
        dt = jnp.zeros((S, S, S, 2), jnp.float32)
        dc3 = dc.reshape(R, R, R, 8, 2)
        k = 0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    dt = jax.lax.dynamic_update_slice(
                        dt,
                        jax.lax.dynamic_slice(
                            dt, (dx, dy, dz, 0), (R, R, R, 2)) + dc3[..., k, :],
                        (dx, dy, dz, 0))
                    k += 1
        return jnp.sum(dt)
    bench("reduce cache grad -> table (8 adds)", reduce_cache, dcache)


if __name__ == "__main__":
    main()
