"""Micro-benchmark of random-access primitives on the live TPU chip.

The NOF train step is gather/scatter bound (BASELINE.md); this measures the
per-row cost of each formulation XLA offers so the hash-grid encoder can be
restructured on data, not guesses:

  1. flat element gather                (the current packed path)
  2. windowed gather slice=(2,)/(4,)   (dense-level corner pairs are adjacent)
  3. flat element scatter-add
  4. windowed scatter-add window=(4,)  (pair corners hit 4 consecutive slots)
  5. Pallas VMEM-resident dynamic gather feasibility probe

float() readback as the barrier (see BASELINE.md timing methodology).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def bench(fn, *args, iters=10):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    T = 2_200_000  # ~ level-3 dense size at the online budget
    N = 3_150_000  # gathers per level per step (393K pts x 8 corners)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T,), dtype=jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T - 8)

    # 1. flat element gather
    f1 = jax.jit(lambda t, i: jnp.sum(t[i]))
    dt = bench(f1, table, idx)
    print(f"flat gather (N,)           : {dt*1e3:7.1f} ms  {dt/N*1e9:6.2f} ns/row")

    # 2. windowed gathers
    for W in (2, 4, 8):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
        f = jax.jit(lambda t, i, dn=dn, W=W: jnp.sum(
            lax.gather(t, i[:, None], dn, slice_sizes=(W,))))
        dt = bench(f, table, idx)
        print(f"windowed gather slice=({W},) : {dt*1e3:7.1f} ms  {dt/N*1e9:6.2f} ns/row "
              f"({dt/(N*W)*1e9:5.2f} ns/elem)")

    # 3. flat element scatter-add
    vals = jax.random.normal(jax.random.PRNGKey(2), (N,), dtype=jnp.float32)
    f3 = jax.jit(lambda t, i, v: jnp.zeros_like(t).at[i].add(v))
    dt = bench(f3, table, idx, vals)
    print(f"flat scatter-add (N,)      : {dt*1e3:7.1f} ms  {dt/N*1e9:6.2f} ns/row")

    # 4. windowed scatter-add
    for W in (4, 8):
        updates = jax.random.normal(jax.random.PRNGKey(3), (N // W * W, W),
                                    dtype=jnp.float32)
        i4 = idx[: N // W * W]
        sdn = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))
        f = jax.jit(lambda t, i, u, sdn=sdn: lax.scatter_add(
            jnp.zeros_like(t), i[:, None], u, sdn))
        dt = bench(f, table, i4, updates)
        rows = N // W * W
        print(f"windowed scatter wnd=({W},)  : {dt*1e3:7.1f} ms  {dt/rows*1e9:6.2f} ns/row "
              f"({dt/(rows*W)*1e9:5.2f} ns/elem)")

    # 5. Pallas VMEM dynamic gather probe (small table resident in VMEM)
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TS = 4096  # small level fits VMEM
        small = jax.random.normal(key, (TS,), dtype=jnp.float32)
        sidx = jax.random.randint(jax.random.PRNGKey(4), (131072,), 0, TS)

        def kern(tab_ref, idx_ref, out_ref):
            out_ref[:] = tab_ref[idx_ref[:]]

        f5 = jax.jit(lambda t, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(i.shape, t.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i))
        dt = bench(f5, small, sidx)
        print(f"pallas VMEM gather         : {dt*1e3:7.1f} ms  "
              f"{dt/131072*1e9:6.2f} ns/row")
    except Exception as e:  # noqa: BLE001
        print(f"pallas VMEM gather         : UNSUPPORTED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]})")


if __name__ == "__main__":
    main()
