"""Pallas TPU kernel: one-pass cache-grad reduce for big dense hash levels.

The backward of the cell-layout hash encode scatters per-run gradient rows
into a corner-duplicated (R^3, 8*C) cache and must then reduce it to the
(S^3 * C,) table cotangent (S = R+1): for each corner c and channel ch,
the column (:, ci*C+ch) viewed as an (R,R,R) cube adds into the table cube
at offset c.  In XLA every extracted column costs a full pass over the
cache (the r3/r4 cost model: 16 passes x 67-134 MB at lv3); the best XLA
formulation found (one-hot 2x2x2 conv) still measures ~9 ms in situ.

This kernel reads each input plane ONCE and emits the reduced output
plane directly:

  grid over gx (S steps).  Output plane gx receives contributions from
  input planes px = gx (corners with c0 = 0) and px = gx-1 (c0 = 1).
  In-plane (y, z) shifts are MATMULS with one-hot shift matrices
  (S,R) @ (R,R) @ (R,S) on the MXU — Mosaic rejects pad/concat with
  sublane offsets, but shift-by-matmul is exact in f32 and fast.

Input bf16 (the staged grad cache), output f32 (the table cotangent) —
mirrors _reduce_cell_cache_grad_conv numerics (f32 accumulation of
bf16-staged values).
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


def _make_kernel(R: int, C: int):
    S = R + 1
    # corner index lookup: (c0, c1, c2) -> position in _CORNERS
    cpos = {tuple(int(v) for v in c): i for i, c in enumerate(_CORNERS)}

    def kernel(a_ref, b_ref, *out_refs):
        gx = pl.program_id(0)
        a_ok = jnp.where(gx < R, 1.0, 0.0)      # plane px = gx exists
        b_ok = jnp.where(gx > 0, 1.0, 0.0)      # plane px = gx - 1 exists
        sy = [_shift_mat(S, R, 0), _shift_mat(S, R, 1)]
        for ch in range(C):
            acc = jnp.zeros((S, S), jnp.float32)
            for c0, src, ok in ((0, a_ref, a_ok), (1, b_ref, b_ok)):
                for c1 in (0, 1):
                    for c2 in (0, 1):
                        ci = cpos[(c0, c1, c2)]
                        col = src[0, :, :, ci * C + ch].astype(jnp.float32)
                        m1 = jax.lax.dot_general(
                            sy[c1], col, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        m2 = jax.lax.dot_general(
                            m1, sy[c2], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        acc = acc + m2 * ok
            out_refs[ch][0] = acc

    return kernel, S


@functools.partial(jax.jit, static_argnames=("R", "C", "interpret"))
def reduce_cell_cache_grad_pallas(d_cache, R: int, C: int,
                                  interpret: bool = False):
    """(R^3, 8*C) grad cache -> (S^3 * C,) flat table cotangent (f32)."""
    S = R + 1
    kernel, _ = _make_kernel(R, C)
    x = d_cache.reshape(R, R, R, 8 * C)
    outs = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            # plane px = gx (clamped; masked in-kernel at gx == R)
            pl.BlockSpec((1, R, R, 8 * C), lambda gx: (jnp.minimum(gx, R - 1), 0, 0, 0)),
            # plane px = gx - 1 (clamped; masked at gx == 0)
            pl.BlockSpec((1, R, R, 8 * C), lambda gx: (jnp.maximum(gx - 1, 0), 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, S, S), lambda gx: (gx, 0, 0)) for _ in range(C)
        ],
        out_shape=[jax.ShapeDtypeStruct((S, S, S), jnp.float32)
                   for _ in range(C)],
        interpret=interpret,
    )(x, x)
    flat = jnp.stack(outs, axis=-1).reshape(-1)
    return flat
