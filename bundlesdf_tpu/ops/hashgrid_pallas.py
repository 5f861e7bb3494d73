"""Pallas TPU kernels for the hash-grid hot path.

The NOF train step is random-access bound (BASELINE.md): XLA's TPU scatter
emitter costs ~25-30 ns per update ROW regardless of width, uniqueness or
dtype, and a pallas scalar loop has a measured floor of ~25 ns/iteration
(/tmp probes, recorded in BASELINE.md r2) — so the win is not a faster
single scatter but FUSING several levels' scatters into ONE loop: the
additional read-modify-writes ride along nearly free once the loop
iteration is paid (measured: 2-level fused scatter 9.6 ms vs 2 XLA
scatters 14.4 ms at N=393K).

Constraints that shape the design:
  * the destination cache block lives in VMEM and is lane-padded 16->128,
    so only levels with R^3 * 128 * 4B within the VMEM budget qualify
    (levels 0-1 at the online budget; level 2 at 134 MB does not);
  * Mosaic supports dynamic ROW indexing of a VMEM ref but not dynamic
    LANE slices, so the (rows, 16) layout is fixed;
  * indices stream through SMEM in chunks (scalar loads), updates through
    VMEM blocks.

Replaces the per-level XLA row scatter for small dense levels inside
hash_encode_cell's custom VJP (ops/hashgrid.py) — reference parity anchor:
this is the table-gradient half of gridencoder.cu:250 kernel_grid_backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One 128-lane-padded f32 cache row = 512 B; inside a larger program the
# custom call gets a 16 MB SCOPED vmem budget (not the chip's full 128 MB),
# so only the smallest level qualifies (4096 rows = 2 MB padded).  The
# dispatch gate in hashgrid.py (_PALLAS_FUSE_ROWS) is the same constant —
# aliased here so the kernel's VMEM-budget assumption and the gate cannot
# drift apart.
from .hashgrid import _PALLAS_FUSE_ROWS as MAX_FUSED_ROWS  # noqa: E402

CHUNK = 2048


@functools.lru_cache(maxsize=None)
def _fused_scatter_fn(rows_tuple: tuple, n_updates: int, width: int):
    """Build the jitted fused multi-destination scatter-add.

    Args (to the returned fn): for each level, an (n_updates,) int32 index
    array and an (n_updates, width) f32 update array; returns one
    (rows, width) f32 accumulator per level.
    """
    n_lv = len(rows_tuple)
    n_chunks = -(-n_updates // CHUNK)
    n_pad = n_chunks * CHUNK

    def kernel(*refs):
        idx_refs = refs[:n_lv]
        upd_refs = refs[n_lv:2 * n_lv]
        out_refs = refs[2 * n_lv:]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for o in out_refs:
                o[:] = jnp.zeros_like(o)

        def body(k, _):
            for i_ref, u_ref, o_ref in zip(idx_refs, upd_refs, out_refs):
                o_ref[i_ref[k], :] += u_ref[k, :]
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    @jax.jit
    def scatter(*args):
        idxs = args[:n_lv]
        upds = args[n_lv:]
        if n_pad != n_updates:
            pad = n_pad - n_updates
            # index 0 + zero update: adds 0.0 to row 0 — exact.
            idxs = tuple(jnp.pad(i, (0, pad)) for i in idxs)
            upds = tuple(jnp.pad(u, ((0, pad), (0, 0))) for u in upds)
        in_specs = (
            [pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM)
             for _ in range(n_lv)]
            + [pl.BlockSpec((CHUNK, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM) for _ in range(n_lv)]
        )
        out_specs = [
            pl.BlockSpec((r, width), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for r in rows_tuple
        ]
        out_shape = [jax.ShapeDtypeStruct((r, width), jnp.float32)
                     for r in rows_tuple]
        return pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            # CPU (tests / virtual multichip) runs the kernel in interpret
            # mode so spec.scatter="pallas" stays testable off-TPU.  Other
            # backends (gpu) must not silently run fully interpreted —
            # fused_cache_scatter raises for them before we get here.
            interpret=jax.default_backend() == "cpu",
        )(*idxs, *upds)

    return scatter


def fused_cache_scatter(cells: list, d_rows: list, rows_list: list):
    """Scatter-add each (N, F) d_rows[i] into a fresh (rows_list[i], F)
    accumulator at row indices cells[i], all levels in ONE pallas loop."""
    backend = jax.default_backend()
    if backend not in ("tpu", "cpu"):
        raise NotImplementedError(
            f"hash_scatter='pallas' supports tpu (compiled) and cpu "
            f"(interpret, for tests) only, not {backend!r}; use "
            "hash_scatter='xla'")
    n = d_rows[0].shape[0]
    f = d_rows[0].shape[1]
    fn = _fused_scatter_fn(tuple(int(r) for r in rows_list), int(n), int(f))
    out = fn(*[c.astype(jnp.int32) for c in cells], *d_rows)
    return list(out) if isinstance(out, (list, tuple)) else [out]
