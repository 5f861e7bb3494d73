"""Pallas TPU kernel: one-pass cache-grad reduce for big dense hash levels.

The backward of the cell-layout hash encode scatters per-run gradient rows
into a corner-duplicated (R^3, 8*C) cache and must then reduce it to the
(S^3 * C,) table cotangent (S = R+1): for each corner c and channel ch,
the column (:, ci*C+ch) viewed as an (R,R,R) cube adds into the table cube
at offset c.  In XLA every extracted column costs a full pass over the
cache (the r3/r4 cost model: 16 passes x 67-134 MB at lv3); the best XLA
formulation found (one-hot 2x2x2 conv) still measures ~9 ms in situ.

This kernel reads each input x-plane ONCE and emits the reduced output
plane directly.  Layout is the whole trick on TPU:

  * The cache is viewed as (R, R, R*8C) so a plane block is (R, R*8C) —
    lane dim a multiple of 128, NO tile padding.  (The naive (R, R, 8C)
    block pads lanes 16 -> 128 and VMEM-OOMs at R=128.)
  * Column extraction from the packed lane dim, the z-shift, and the
    corner/channel de-interleave are ONE 2-hot right matmul
    (R*8C, S*C); the y-shift is a one-hot left matmul (S, R).  Both ride
    the bf16 MXU with f32 accumulation — every output element is a sum
    of at most 8 bf16-valued terms accumulated in f32, matching
    _reduce_cell_cache_grad_conv numerics exactly.
  * Grid over gx (S steps).  Output plane gx receives contributions from
    input planes px = gx (corners with c0 = 0) and px = gx - 1 (c0 = 1);
    block index maps clamp and scalar masks zero the out-of-range plane.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .hashgrid import _CORNERS


def _shift_mat(S: int, R: int, off: int, dtype=jnp.float32):
    """(S, R) one-hot: out[i, j] = 1 iff i == j + off."""
    i = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (S, R), 1)
    return (i == j + off).astype(dtype)


def _zshift_mat(R: int, C: int, c0: int, c1: int, cpos, dtype=jnp.bfloat16):
    """(R*8C, S*C) 2-hot: F[k, gz*C + ch] = 1 iff the packed-plane element
    k = z*8C + ci*C + ch (corner ci = (c0, c1, c2), either c2) lands in
    output column (gz, ch), i.e. k == (gz - c2)*8C + ci*C + ch.

    gz - c2 in [0, R-1] holds automatically because k // 8C < R.
    """
    S = R + 1
    F = 8 * C
    k = jax.lax.broadcasted_iota(jnp.int32, (R * F, S * C), 0)
    o = jax.lax.broadcasted_iota(jnp.int32, (R * F, S * C), 1)
    gz = o // C
    ch = o % C
    acc = jnp.zeros((R * F, S * C), dtype)
    for c2 in (0, 1):
        ci = cpos[(c0, c1, c2)]
        acc = acc + (k == (gz - c2) * F + ci * C + ch).astype(dtype)
    return acc


def _make_kernel(R: int, C: int):
    S = R + 1
    cpos = {tuple(int(v) for v in c): i for i, c in enumerate(_CORNERS)}

    def kernel(a_ref, b_ref, out_ref):
        gx = pl.program_id(0)
        a_ok = jnp.where(gx < R, 1.0, 0.0)      # plane px = gx exists
        b_ok = jnp.where(gx > 0, 1.0, 0.0)      # plane px = gx - 1 exists
        acc = jnp.zeros((S, S * C), jnp.float32)
        for c0, src, ok in ((0, a_ref, a_ok), (1, b_ref, b_ok)):
            plane = src[0]                       # (R, R*8C) bf16
            for c1 in (0, 1):
                # y-shift: (S, R) @ (R, R*8C); one term per output, so the
                # f32 result is bf16-valued and the downcast is exact
                # (Mosaic requires a 32-bit matmul accumulator).
                m = jax.lax.dot_general(
                    _shift_mat(S, R, c1, jnp.bfloat16), plane,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                # extract + z-shift + de-interleave: 2-hot right matmul,
                # f32 accumulation of bf16-valued terms (exact).
                fz = _zshift_mat(R, C, c0, c1, cpos)
                acc = acc + jax.lax.dot_general(
                    m, fz, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * ok
        out_ref[0] = acc

    return kernel, S


@functools.partial(jax.jit, static_argnames=("R", "C", "interpret"))
def reduce_cell_cache_grad_pallas(d_cache, R: int, C: int,
                                  interpret: bool = False):
    """(R^3, 8*C) grad cache -> (S^3 * C,) flat table cotangent (f32)."""
    S = R + 1
    kernel, _ = _make_kernel(R, C)
    x = d_cache.reshape(R, R, R * 8 * C).astype(jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            # plane px = gx (clamped; masked in-kernel at gx == R)
            pl.BlockSpec((1, R, R * 8 * C),
                         lambda gx: (jnp.minimum(gx, R - 1), 0, 0)),
            # plane px = gx - 1 (clamped; masked at gx == 0)
            pl.BlockSpec((1, R, R * 8 * C),
                         lambda gx: (jnp.maximum(gx - 1, 0), 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, S * C), lambda gx: (gx, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((S, S, S * C), jnp.float32),
        interpret=interpret,
    )(x, x)
    return out.reshape(-1)
