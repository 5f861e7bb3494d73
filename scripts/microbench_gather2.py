"""Micro-benchmark round 2: XLA gather/scatter FLAG effects at in-situ
sizes, Mosaic dynamic_gather (take_along_axis) rate inside Pallas, and XLA
sort throughput (to cost a bucket-by-lane gather design).

Round-1 data (scripts/microbench_gather.py): flat gather 7.6 ns/elem, flat
scatter-add 17.5 ns/elem, windowed variants catastrophically slow, direct
int indexing in Pallas unsupported.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, *args, iters=10):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    T = 2_480_000   # total online table entries
    NG = 12_600_000  # fwd gathers per step (packed)
    NS = 25_200_000  # bwd scatter elements per step
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T,), dtype=jnp.float32)
    idx_g = jax.random.randint(jax.random.PRNGKey(1), (NG,), 0, T)
    tab2 = jax.random.normal(key, (2 * T,), dtype=jnp.float32)
    idx_s = jax.random.randint(jax.random.PRNGKey(2), (NS,), 0, 2 * T)
    vals = jax.random.normal(jax.random.PRNGKey(3), (NS,), dtype=jnp.float32)

    f = jax.jit(lambda t, i: jnp.sum(t[i]))
    dt = bench(f, table, idx_g, iters=5)
    print(f"gather default      : {dt*1e3:7.1f} ms  {dt/NG*1e9:6.2f} ns/elem")

    f = jax.jit(lambda t, i: jnp.sum(t.at[i].get(mode="promise_in_bounds")))
    dt = bench(f, table, idx_g, iters=5)
    print(f"gather promise_ib   : {dt*1e3:7.1f} ms  {dt/NG*1e9:6.2f} ns/elem")

    f = jax.jit(lambda t, i: jnp.sum(
        t.at[i].get(mode="promise_in_bounds", indices_are_sorted=True)))
    idx_sorted = jnp.sort(idx_g)
    dt = bench(f, table, idx_sorted, iters=5)
    print(f"gather pib+sorted   : {dt*1e3:7.1f} ms  {dt/NG*1e9:6.2f} ns/elem")

    f = jax.jit(lambda t, i, v: jnp.zeros_like(t).at[i].add(v))
    dt = bench(f, tab2, idx_s, vals, iters=3)
    print(f"scatter default     : {dt*1e3:7.1f} ms  {dt/NS*1e9:6.2f} ns/elem")

    f = jax.jit(lambda t, i, v: jnp.zeros_like(t).at[i].add(
        v, mode="promise_in_bounds"))
    dt = bench(f, tab2, idx_s, vals, iters=3)
    print(f"scatter promise_ib  : {dt*1e3:7.1f} ms  {dt/NS*1e9:6.2f} ns/elem")

    f = jax.jit(lambda t, i, v: jnp.zeros_like(t).at[i].add(
        v, mode="promise_in_bounds", indices_are_sorted=True))
    order = jnp.argsort(idx_s)
    dt = bench(f, tab2, idx_s[order], vals[order], iters=3)
    print(f"scatter pib+sorted  : {dt*1e3:7.1f} ms  {dt/NS*1e9:6.2f} ns/elem")

    # segment-sum style: sorted indices + associative scan alternative
    f = jax.jit(lambda i: jnp.sort(i))
    dt = bench(f, idx_s, iters=3)
    print(f"sort 25.2M uint32   : {dt*1e3:7.1f} ms  {dt/NS*1e9:6.2f} ns/elem")

    f = jax.jit(lambda i, v: jax.ops.segment_sum(v, i, num_segments=2 * T,
                                                 indices_are_sorted=True))
    dt = bench(f, idx_s[order], vals[order], iters=3)
    print(f"segsum sorted 25.2M : {dt*1e3:7.1f} ms  {dt/NS*1e9:6.2f} ns/elem")

    # Mosaic dynamic_gather rate: take_along_axis with same-shape 2D args.
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        S, L, reps = 512, 128, 64

        def kern(x_ref, i_ref, o_ref):
            x = x_ref[:]
            idx = i_ref[:]
            acc = jnp.zeros_like(x)

            def body(k, acc):
                g = jnp.take_along_axis(x, (idx + k) % S, axis=0)
                return acc + g

            o_ref[:] = jax.lax.fori_loop(0, reps, body, acc)

        x = jax.random.normal(key, (S, L), dtype=jnp.float32)
        i2 = jax.random.randint(jax.random.PRNGKey(5), (S, L), 0, S)
        fp = jax.jit(lambda x, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, i))
        dt = bench(fp, x, i2, iters=10)
        n = S * L * reps
        print(f"pallas dyn_gather ax0: {dt*1e3:7.2f} ms  {dt/n*1e9:6.3f} ns/elem "
              f"({n} gathers/call)")
    except Exception as e:  # noqa: BLE001
        print(f"pallas dyn_gather ax0: UNSUPPORTED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]})")


if __name__ == "__main__":
    main()
