"""Multiresolution hash-grid positional encoder (instant-NGP style).

TPU-native replacement for the reference's CUDA grid encoder
(mycuda/torch_ngp_grid_encoder/gridencoder.cu kernels + grid.py autograd):
the per-level trilinear gather is unrolled into flat 1-D XLA gathers and
the backward is a custom VJP issuing ONE flat scatter-add (atomics-free;
see hash_encode docstring for the TPU layout rationale).

Scheme parity with the reference kernel (gridencoder.cu:155-190):
  * per-level scale  = exp2(level * log2(per_level_scale)) * base - 1
  * resolution       = ceil(scale) + 1
  * pos              = x01 * scale + 0.5   (align_corners = False)
  * dense row-major index when (res+1)^3 fits the table, else spatial hash
    with primes {1, 2654435761, 805459861}
  * trilinear blend of the 8 corners, levels concatenated.

The table is a single flat (total_entries * level_dim,) array with static
per-level offsets — the natural unit to index-shard across devices for the
multi-host map-partitioning path (see parallel/).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861)


class HashGridSpec(NamedTuple):
    """Static hash-grid geometry (hashable; safe as a jit static arg)."""

    num_levels: int
    level_dim: int
    base_res: int
    finest_res: int
    log2_hashmap_size: int
    # "exact": per-corner element gathers (the straightforward path).
    # "cell":  corner-duplicated cell-cache fast path for DENSE levels
    #          (hash_encode_cell) — same f32 math, ~8x fewer random
    #          accesses; hashed levels fall back to the element path.
    layout: str = "exact"
    # "xla": per-level XLA row scatter-adds in the backward (portable).
    # "pallas": fuse the small dense levels' scatters into one pallas
    #           scalar loop with VMEM-resident accumulators (TPU only,
    #           single-device programs — GSPMD cannot partition the
    #           custom call; see ops/hashgrid_pallas.py).
    scatter: str = "xla"
    # Staging dtype for BIG dense levels (>= _BIG_CACHE_CELLS cells):
    # "bfloat16" halves the HBM traffic of the corner cache (fwd gather
    # source), the backward's scatter destination, and feeds a one-pass
    # conv cache-grad reduce.  TABLE WEIGHTS, Adam state and the final
    # d_table stay f32 — only the per-step staging copies are rounded
    # (mixed precision; the r3 cost model showed the step is ~100%
    # bandwidth on exactly these arrays).  "float32" = exact (default).
    big_dtype: str = "float32"
    # Cache-grad reduce for bf16-staged big dense levels: "conv" = the
    # one-hot 2x2x2 conv (portable, GSPMD-shardable); "pallas" = the
    # plane-sweep matmul-shift kernel (ops/reduce_pallas.py) — one pass
    # over the cache, 11.4 -> 4.7 ms at lv3 on v5e, differs from conv
    # only by f32 summation order (<=1 ulp).  Use resolve_reduce().
    reduce: str = "conv"

    @property
    def per_level_scale(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(
            np.exp2(np.log2(self.finest_res / self.base_res) / (self.num_levels - 1))
        )

    def level_params(self):
        """Per-level (scale, resolution, table_size, offset, dense?)."""
        hashmap_size = 1 << self.log2_hashmap_size
        out = []
        offset = 0
        S = np.log2(self.per_level_scale)
        for lv in range(self.num_levels):
            scale = float(np.exp2(lv * S) * self.base_res - 1.0)
            res = int(np.ceil(scale)) + 1
            dense_size = (res + 1) ** 3
            size = min(dense_size, hashmap_size)
            # align to 8 like the reference for hardware-friendly strides
            size = int(np.ceil(size / 8)) * 8
            dense = dense_size <= hashmap_size
            out.append(dict(scale=scale, res=res, size=size, offset=offset, dense=dense))
            offset += size
        return out

    @property
    def total_entries(self) -> int:
        return sum(p["size"] for p in self.level_params())

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.level_dim


def init_table(key: jax.Array, spec: HashGridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) init like the reference grid.py reset_parameters.

    The table is FLAT 1-D, shape (total_entries * level_dim,), row-major —
    entry e's features at [e*C : (e+1)*C].  On TPU a (T, 2) parameter (and
    every temp/cotangent shaped like it) lane-pads 2 -> 128 (64x memory: a
    9.7 GB cotangent temp at the offline budget); a 1-D array tiles
    compactly (T(1024)), so gathers, the scatter-add cotangent, and Adam
    state all stay unpadded."""
    return jax.random.uniform(
        key, (spec.total_entries * spec.level_dim,), dtype=dtype,
        minval=-1e-4, maxval=1e-4
    )


def _corner_index(grid_xyz, res: int, size: int, dense: bool):
    """Map integer corner coords (..., 3) -> table row index."""
    if dense:
        # Row-major dense index; always < (res+1)^3 <= size (level_params
        # only marks a level dense when the full cube fits), so no modulo —
        # integer mod by a non-power-of-2 costs real VPU cycles at 12.6M
        # corner indexings per train step.
        stride = res + 1
        idx = (
            grid_xyz[..., 0] * (stride * stride)
            + grid_xyz[..., 1] * stride
            + grid_xyz[..., 2]
        )
        return idx.astype(jnp.uint32)
    g = grid_xyz.astype(jnp.uint32)
    h = (
        (g[..., 0] * jnp.uint32(_PRIMES[0]))
        ^ (g[..., 1] * jnp.uint32(_PRIMES[1]))
        ^ (g[..., 2] * jnp.uint32(_PRIMES[2]))
    )
    return h % jnp.uint32(size)


# 8 corner offsets of the trilinear cell, static.
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)


def _encode_impl(x, table, spec: HashGridSpec):
    """Forward trilinear hash encode over the FLAT table.  Static unroll
    over the 8 corners and over the C channels: every intermediate is a
    plain (N,) vector — never (N, 8, ·) or (N, C) — because any small minor
    dimension tiles to 128 lanes on TPU (a (C, N, 8) jvp temp of an earlier
    formulation OOMed the offline-budget train step at 640 MB/buffer)."""
    C = spec.level_dim
    x01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
    cols = []  # L * C arrays of (N,)
    for p in spec.level_params():
        pos = x01 * p["scale"] + 0.5
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        pos_grid = pos_grid.astype(jnp.int32)  # (N, 3)
        acc = [None] * C
        for c in _CORNERS:
            idx = _corner_index(pos_grid + c[None], p["res"], p["size"], p["dense"])
            base = (p["offset"] + idx.astype(jnp.int32)) * C
            w = jnp.prod(
                jnp.where(c[None].astype(bool), frac, 1.0 - frac), axis=-1
            )  # (N,)
            for ch in range(C):
                term = table[base + ch] * w
                acc[ch] = term if acc[ch] is None else acc[ch] + term
        cols.extend(acc)
    return jnp.stack(cols, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode(x: jnp.ndarray, table: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Encode points x in [-1, 1]^3 -> (N, num_levels * level_dim).

    Out-of-range points are clamped (callers mask validity separately, as
    the reference does in run_network nerf_runner.py:1246).

    Custom VJP (replaces the reference's kernel_grid_backward atomics,
    gridencoder.cu:250): the table cotangent is ONE flat scatter-add into a
    (total*C,) view — measured 3.3x faster on TPU than XLA's row-scatter
    from plain autodiff ((T, 2)-shaped scatter pays a 64x lane-padding tax).
    Indices/weights are recomputed in the backward (cheap gathers) instead
    of saved (a (N, 8L, C) residual would re-introduce the padding blowup).
    """
    return _encode_impl(x, table, spec)


def _hash_encode_fwd(x, table, spec):
    return _encode_impl(x, table, spec), (x, table)


def _hash_encode_bwd(spec, res, g):
    x, table = res
    C = spec.level_dim
    x01 = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
    flat_idx_parts = []
    contrib_parts = []
    dx01 = jnp.zeros_like(x)
    for li, p in enumerate(spec.level_params()):
        g_cols = [g[:, li * C + ch] for ch in range(C)]  # C x (N,)
        pos = x01 * p["scale"] + 0.5
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        pos_grid = pos_grid.astype(jnp.int32)
        for c in _CORNERS:
            idx = _corner_index(pos_grid + c[None], p["res"], p["size"], p["dense"])
            base = (p["offset"] + idx.astype(jnp.int32)) * C  # (N,)
            sel = jnp.where(c[None].astype(bool), frac, 1.0 - frac)  # (N, 3)
            w = jnp.prod(sel, axis=-1)  # (N,)
            gdotrow = None
            for ch in range(C):
                # table cotangent contribution
                flat_idx_parts.append(base + ch)
                contrib_parts.append(w * g_cols[ch])
                # coordinate cotangent needs g . T[row]
                t = g_cols[ch] * table[base + ch]
                gdotrow = t if gdotrow is None else gdotrow + t
            # dw/dx01_k = scale * sign_k * prod_{j!=k} sel_j
            sign = jnp.where(c[None].astype(bool), 1.0, -1.0)  # (1, 3)
            prod_others = jnp.stack(
                [sel[:, 1] * sel[:, 2], sel[:, 0] * sel[:, 2],
                 sel[:, 0] * sel[:, 1]], axis=-1)  # (N, 3)
            dx01 = dx01 + (gdotrow[:, None] * sign * prod_others) * p["scale"]
    # ONE flat 1-D scatter-add, cotangent already in the param's shape —
    # no reshape, no padded temps.  Indices are in bounds by construction
    # (dense row-major < size; hashed % size), so promise_in_bounds skips
    # XLA's clamp/select per element (measured 23.6 -> 17.3 ns/elem).
    d_table = jnp.zeros_like(table).at[
        jnp.concatenate(flat_idx_parts)
    ].add(jnp.concatenate(contrib_parts), mode="promise_in_bounds")
    # chain through x01 = clip((x+1)/2): derivative 0.5 inside, 0 at clip
    inside = (jnp.abs(x) <= 1.0).astype(x.dtype)
    dx = dx01 * 0.5 * inside
    return dx, d_table


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)


# ---------------------------------------------------------------------------
# Cell-cache fast path ("cell" layout).
#
# The NOF train step is ~100% random hash-table traffic at the online budget
# (BASELINE.md): the exact path issues 25.2M element gathers forward
# (8 corners x 4 levels x 2 channels x 393K pts), re-gathers 25.2M in the
# backward for the coordinate cotangent, and scatter-adds 25.2M — and XLA
# charges per random access (~6-7 ns each), so COUNT is everything.
#
# For a DENSE level the corner index is row-major, so the 8 corners of every
# cell are eight SHIFTED SLICES of the level's (S,S,S,C) table view.  That
# makes a corner-duplicated cache buildable with pure dense copies:
#
#     cache[cell(x,y,z), corner c, ch] = table[(x+dx)*S^2+(y+dy)*S+(z+dz), ch]
#
# and the per-point work collapses to ONE 16-wide row gather per level
# (1.57M rows/step vs 25.2M elements) and, in the VJP, ONE 16-wide row
# scatter-add into a cache-shaped gradient, which reduces back to the table
# gradient with 8 dense shifted adds.  Measured on the v5e chip
# (scripts/microbench_gather4.py, in-situ shapes): row gather 19.9 ms vs
# 144.1 ms element equivalent; row scatter 47.6 ms vs 69.6 ms; cache build
# 6.5 ms; grad reduce 16.1 ms.  Math is EXACT f32 (identical contraction
# order to hash_encode) — this replaces an earlier bf16-packed experiment
# that measured slower (212 ms fwd vs 78 ms).
#
# Hashed (non-dense) levels have no slice structure and keep the element
# path; a level mix (offline budget: ~10 dense + 6 hashed of 16) composes
# both inside one encode.
#
# Reference parity: same trilinear scheme as gridencoder.cu:155-190; the
# corner-duplicated cache is our TPU answer to its per-thread gather loop.
# ---------------------------------------------------------------------------


def _level_views(table, spec: HashGridSpec):
    """Split the flat table into per-level flat (size*C,) views."""
    C = spec.level_dim
    views = []
    for p in spec.level_params():
        views.append(
            jax.lax.slice(table, (p["offset"] * C,),
                          ((p["offset"] + p["size"]) * C,)))
    return views


# Dense levels at or above this CELL count stage through spec.big_dtype
# (lv2 64^3 and lv3 128^3 at the online budget; the small levels' arrays
# are too small for bandwidth to matter).
_BIG_CACHE_CELLS = 1 << 18


def _lvl_dtype(spec, p):
    """Staging dtype for one level's cache / grad-cache."""
    if (spec.big_dtype == "bfloat16" and p["dense"]
            and p["res"] ** 3 >= _BIG_CACHE_CELLS):
        return jnp.bfloat16
    return jnp.float32


def _build_cell_cache(level_table, p, C: int, dtype=jnp.float32):
    """Dense level (size*C,) flat view -> (res^3, 8*C) corner cache.

    Pure dense slicing — no random access.  Corner order matches _CORNERS;
    channels minor: column c*C+ch.  Everything is CHANNEL-SPLIT 3-D
    internally: a (..., C) temp with C=2 minor would lane-pad 2 -> 128
    (64x traffic) on TPU, so per-channel (S,S,S) cubes (minor ~= 128) are
    sliced and a single stack builds the (R^3, 16) cache at the end."""
    S = p["res"] + 1
    R = p["res"]
    cols = []
    for c in _CORNERS:
        for ch in range(C):
            t3 = jnp.reshape(
                jax.lax.slice(level_table, (ch,), (S * S * S * C,), (C,)),
                (S, S, S))
            sl = jax.lax.slice(t3, (int(c[0]), int(c[1]), int(c[2])),
                               (int(c[0]) + R, int(c[1]) + R, int(c[2]) + R))
            cols.append(sl.reshape(R * R * R).astype(dtype))
    return jnp.stack(cols, axis=-1)  # (R^3, 8*C)


def _reduce_cell_cache_grad(d_cache, p, C: int):
    """(res^3, 8*C) cache cotangent -> flat (size*C,) table cotangent via 8
    dense shifted adds (the transpose of _build_cell_cache).

    Formulated as 16 STRIDED 1-D slices + 8 pad-and-adds per channel.  Two
    earlier formulations measured slower IN COMPOSITION with the producing
    scatter (scripts/bisect_step.py lineage, /tmp probes r2): a
    dynamic_update_slice chain (serialized 16 read-modify-write rounds of
    the accumulator) and a transpose-first variant (d_cache.T makes column
    reads contiguous but the transpose of the scatter's output forces a
    ~20 ms relayout at the online budget: 59.2 -> 39.4 ms for the composed
    scatter+reduce when replaced by strided slices that read the scatter
    destination in its NATIVE flat layout).  jnp.pad composes into a single
    fused elementwise sum; per-entry corner accumulation ORDER matches the
    original chain — bitwise-identical output.  Channel-split 3-D
    accumulators for the same lane-padding reason as the build."""
    S = p["res"] + 1
    R = p["res"]
    flat_in = d_cache.reshape(-1)
    acc = []
    for ch in range(C):
        a3 = None
        for ci, c in enumerate(_CORNERS):
            col = jax.lax.slice(
                flat_in, (ci * C + ch,), (flat_in.shape[0],), (8 * C,)
            ).reshape(R, R, R)
            padded = jnp.pad(
                col,
                ((int(c[0]), 1 - int(c[0])),
                 (int(c[1]), 1 - int(c[1])),
                 (int(c[2]), 1 - int(c[2]))),
            )
            a3 = padded if a3 is None else a3 + padded
        acc.append(a3.reshape(-1))
    flat = jnp.stack(acc, axis=-1).reshape(-1)  # interleave channels
    if S * S * S < p["size"]:
        flat = jnp.pad(flat, (0, (p["size"] - S * S * S) * C))
    return flat


def _reduce_cell_cache_grad_conv(d_cache, p, C: int):
    """Cache-grad reduce for bf16-staged levels: one-hot 2x2x2 3-D conv
    (input channels 8*C -> C), f32 accumulation.

    Measured at the lv3 shape (r4): STANDALONE a transpose-first pad-add
    looks best (8.8 ms vs conv 14.3 vs bf16 strided slices 16.6), but IN
    SITU the transpose of the scatter's output forces a relayout (full
    step 48.2 ms vs 42.4 with the conv — the same composition pathology
    r3 hit at f32), so the conv form ships.  An f32 conv stays rejected
    (HIGHEST-precision f32 convs are ~8 MXU passes, r3)."""
    R = p["res"]
    S = R + 1
    x = d_cache.reshape(1, R, R, R, 8 * C)
    w = np.zeros((2, 2, 2, 8 * C, C), np.float32)
    for ci, c in enumerate(_CORNERS):
        for ch in range(C):
            # out[z+cz, y+cy, x+cx, ch] += in[z, y, x, ci*C+ch]
            # conv: out[o] = sum_k in[o + k - pad_lo] * w[k]; pad_lo = 1
            # -> k = 1 - c
            w[1 - int(c[0]), 1 - int(c[1]), 1 - int(c[2]), ci * C + ch, ch] = 1.0
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w, d_cache.dtype),
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )  # (1, S, S, S, C) f32
    flat = out.reshape(-1)
    if S * S * S < p["size"]:
        flat = jnp.pad(flat, (0, (p["size"] - S * S * S) * C))
    return flat


def _axes01(x):
    """Split x in [-1,1]^3 into per-axis (N,) [0,1] coords.

    EVERYTHING elementwise in the cell path runs on (N,) vectors: an
    (N, 3) f32 temp lane-pads 3 -> 128 on TPU (201 MB per temp at the
    online budget's N = 393K), so the trilinear math is channel-split
    per axis.  Same f32 contraction order as the fused (N, 3) form."""
    return tuple(
        jnp.clip((x[:, k] + 1.0) * 0.5, 0.0, 1.0) for k in range(3)
    )


def _level_fracs(axes, p):
    """Per-axis (pos_grid:int32, frac) for one level — all (N,) vectors."""
    pgs, fracs = [], []
    for a in axes:
        pos = a * p["scale"] + 0.5
        pos_grid = jnp.floor(pos)
        pgs.append(pos_grid.astype(jnp.int32))
        fracs.append(pos - pos_grid)
    return pgs, fracs


def _corner_index_axes(gx, gy, gz, res: int, size: int, dense: bool):
    """Per-axis variant of _corner_index ((N,) int32 inputs)."""
    if dense:
        stride = res + 1
        return (gx * (stride * stride) + gy * stride + gz).astype(jnp.uint32)
    h = (
        (gx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0]))
        ^ (gy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
        ^ (gz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    )
    return h % jnp.uint32(size)


def _cell_of(pgs, R: int):
    return pgs[0] * (R * R) + pgs[1] * R + pgs[2]


def _cell_rows(axes, cache, p, C: int):
    """Gather each point's (N, 8*C) corner rows + return per-axis fracs.

    Rows stay in the gather's NATURAL (N, 8*C) layout: an earlier variant
    transposed to (8*C, N) for unpadded residuals, but the composed
    gather -> transpose -> trilinear chain forced a ~13 ms relayout at the
    online budget (34.8 -> 22.0 ms with natural column reads, bitwise
    equal — /tmp fwd probes r2)."""
    R = p["res"]
    pgs, fracs = _level_fracs(axes, p)
    cell = _cell_of(pgs, R)
    rows = cache[cell]
    return rows, fracs, cell


def _window_gather(flat, starts, C: int):
    """Gather (N, C) windows from a flat 1-D table at element offsets
    ``starts`` — ONE random access per ENTRY instead of per element
    (an entry's C channels are adjacent in the flat layout; access COUNT
    is what XLA charges for, scripts/bisect_offline.py)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
    return jax.lax.gather(
        flat, starts[:, None], dn, slice_sizes=(C,),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _hashed_rows(axes, level_table, p, C: int):
    """Hashed-level fallback shaped like _cell_rows: 8 window-C gathers
    (one random access per corner) instead of 8*C element gathers.
    Returns natural-layout (N, 8*C) rows like _cell_rows."""
    pgs, fracs = _level_fracs(axes, p)
    pairs = []
    for c in _CORNERS:
        idx = _corner_index_axes(
            pgs[0] + int(c[0]), pgs[1] + int(c[1]), pgs[2] + int(c[2]),
            p["res"], p["size"], p["dense"])
        pairs.append(_window_gather(level_table, idx.astype(jnp.int32) * C, C))
    return jnp.concatenate(pairs, axis=-1), fracs, None  # (N, 8*C)


def _corner_sels(fracs, c):
    """Per-axis selected frac factors for corner c — three (N,) vectors."""
    return tuple(
        fracs[k] if c[k] else 1.0 - fracs[k] for k in range(3)
    )


# Dense levels whose corner cache exceeds this byte size gather through
# the two-stage (run-start + small-source redistribute) path when the
# ray-structured 'seg' mode is on: XLA's row-gather cost scales with
# SOURCE size (~0 ms in-situ from <= 8 MB, ~7 ms from 134 MB at 393K rows
# — scripts/probe_fwdgather.py), so fetching each distinct cell once from
# HBM and redistributing from a compact VMEM-sized buffer wins big.
_SEG_GATHER_BYTES = 64 * 1024 * 1024


def _cell_rows_seg(axes, cache, p, C: int, n_rays: int, n_pts: int):
    """Two-stage run-dedup gather (bitwise-identical rows to _cell_rows):
    gather each run's cache row once, then redistribute per sample from
    the compact buffer.  Falls back to the direct gather when a ray has
    more runs than the static cap (cond, both branches compiled)."""
    R = p["res"]
    pgs, fracs = _level_fracs(axes, p)
    cell = _cell_of(pgs, R)
    S = n_pts // n_rays
    cap = _seg_cap(R, S)
    cell2d = cell.reshape(n_rays, S)
    b = jnp.ones((n_rays, S), bool).at[:, 1:].set(
        cell2d[:, 1:] != cell2d[:, :-1])
    n_runs = jnp.sum(b, axis=1)

    def seg_path(cell_flat):
        seg_id = jnp.cumsum(b, axis=1) - 1  # (n_rays, S)
        sdt = jnp.uint8 if S <= 255 else jnp.int32
        ks = jnp.arange(cap, dtype=sdt)
        # first sample of run k = #samples in runs < k (u8 compare-reduce:
        # the (n_rays, cap, S) temp at 1/4 the bytes)
        cnt_less = jnp.sum(
            (seg_id.astype(sdt)[:, None, :] < ks[None, :, None]).astype(
                jnp.uint8), axis=2, dtype=jnp.int32)
        start_pos = jnp.clip(cnt_less, 0, S - 1)
        flat_start = (jnp.arange(n_rays)[:, None] * S + start_pos).reshape(-1)
        compact = cache[cell_flat[flat_start]]  # (n_rays*cap, 8C) from HBM
        flat_sid = (jnp.arange(n_rays)[:, None] * cap
                    + jnp.minimum(seg_id, cap - 1)).reshape(-1)
        return compact[flat_sid]  # (N, 8C) from the small buffer

    def direct_path(cell_flat):
        return cache[cell_flat]

    if cap >= S:
        rows = seg_path(cell)
    else:
        rows = jax.lax.cond(jnp.max(n_runs) <= cap, seg_path, direct_path,
                            cell)
    return rows, fracs, cell


def _encode_cell_impl(x, table, spec: HashGridSpec, n_rays: int = 0):
    """Forward for the "cell" layout.  Returns (out, per-level rows)."""
    C = spec.level_dim
    axes = _axes01(x)
    views = _level_views(table, spec)
    cols = []
    rows_all = []
    for p, view in zip(spec.level_params(), views):
        if p["dense"]:
            dt = _lvl_dtype(spec, p)
            cache = _build_cell_cache(view, p, C, dt)
            cache_bytes = (p["res"] ** 3) * 8 * C * jnp.dtype(dt).itemsize
            if (spec.scatter == "seg" and n_rays > 0
                    and x.shape[0] % n_rays == 0
                    and cache_bytes > _SEG_GATHER_BYTES):
                rows, fracs, _ = _cell_rows_seg(
                    axes, cache, p, C, n_rays, x.shape[0])
            else:
                rows, fracs, _ = _cell_rows(axes, cache, p, C)
        else:
            rows, fracs, _ = _hashed_rows(axes, view, p, C)
        rows_all.append(rows)
        acc = [None] * C
        for ci, c in enumerate(_CORNERS):
            s0, s1, s2 = _corner_sels(fracs, c)
            w = (s0 * s1) * s2
            for ch in range(C):
                term = rows[:, ci * C + ch] * w
                acc[ch] = term if acc[ch] is None else acc[ch] + term
        cols.extend(acc)
    return jnp.stack(cols, axis=-1), tuple(rows_all)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_cell(
    x: jnp.ndarray, table: jnp.ndarray, spec: HashGridSpec
) -> jnp.ndarray:
    """Cell-cache variant of hash_encode — identical contract and f32 math,
    ~8x fewer random HBM accesses on dense levels (see module comment)."""
    return _encode_cell_impl(x, table, spec)[0]


def _hash_encode_cell_fwd(x, table, spec):
    out, rows_all = _encode_cell_impl(x, table, spec)
    # rows are saved as residuals in their natural (N, 8*C) gather layout
    # (the dx path's gdotrow is the only consumer; layout-indifferent in
    # measurement): the backward streams them back instead of re-issuing
    # the random gathers (the exact path's second 25.2M loads).
    return out, (x, rows_all)


# XLA's TPU scatter has two regimes, switched by destination ROW COUNT (not
# bytes, not touched footprint, not collisions/sortedness/dtype): row
# scatters into <= 2^18-row destinations cost ~30 ns/update row, into
# >= 524K-row ones ~116 ns/row — and width is free up to the 128-lane tile
# ((N,128) rows into (262K,128) = 134 MB costs the same ~10 ms as (N,16)
# into 16.8 MB; scripts/microbench_scatter5/6/7/8.py).  Large dense levels
# therefore scatter through a LANE-PACKED destination: 8 cells share one
# 128-wide row in disjoint 16-wide column blocks, cutting destination rows
# 8x at identical bytes, then reshape back row-major for free.
_FAST_SCATTER_ROWS = 1 << 18

# Dense levels at or below this row count scatter through the fused pallas
# loop when spec.scatter == "pallas" (the lane-padded cache must fit the
# 16 MB scoped-vmem budget of the surrounding program; level 0 only at the
# online geometry — see ops/hashgrid_pallas.py).
_PALLAS_FUSE_ROWS = 1 << 12


def _packed_row_scatter(cell, d_rows, n_dest_rows: int):
    """Scatter-add (N, F) rows at ``cell`` into (n_dest_rows, F) via a
    lane-packed destination: P = 128 // F cells share one (P*F,)-wide
    destination row (cell c -> row c // P, column block (c % P) * F), so
    the destination has n_dest_rows / P rows and stays inside the
    fast-regime row count at the SAME byte size.  Each update is the
    point's F values placed in its block, zeros elsewhere — different
    cells in one row touch disjoint blocks (adding 0.0 elsewhere, exact),
    and the packed result reshapes back to (n_dest_rows, F) for FREE
    (row-major: row r col j  <->  cell r*P + j//F, channel j%F)."""
    N, F = d_rows.shape
    P = max(1, 128 // F)
    rows = -(-n_dest_rows // P)
    row = cell // P
    blk = cell % P
    cols = jnp.arange(P * F, dtype=cell.dtype)[None, :] // F
    upd = jnp.where(cols == blk[:, None], jnp.tile(d_rows, (1, P)), 0.0)
    if rows <= _FAST_SCATTER_ROWS:
        packed = jnp.zeros((rows, P * F), d_rows.dtype).at[row].add(
            upd, mode="promise_in_bounds")
    else:
        # Still over the fast-regime row count after packing (res > 128 at
        # the offline budget): mask-split into S contiguous destination
        # chunks of <= 2^18 rows.  S masked full-N scatters at ~30 ns/row
        # beat one at ~116 ns/row for S <= 3 (no sort/routing needed; out-
        # of-chunk rows add 0.0 to row 0 — exact).
        S = -(-rows // _FAST_SCATTER_ROWS)
        chunk = -(-rows // S)
        parts = []
        for s in range(S):
            sel = (row >= s * chunk) & (row < (s + 1) * chunk)
            r = jnp.where(sel, row - s * chunk, 0)
            u = jnp.where(sel[:, None], upd, 0.0)
            parts.append(
                jnp.zeros((chunk, P * F), d_rows.dtype).at[r].add(
                    u, mode="promise_in_bounds"))
        packed = jnp.concatenate(parts, axis=0)[:rows]
    return packed.reshape(rows * P, F)[:n_dest_rows]


def _cell_cache_scatter(cell, d_rows, n_dest_rows: int):
    if n_dest_rows > _FAST_SCATTER_ROWS and d_rows.shape[1] < 128:
        return _packed_row_scatter(cell, d_rows, n_dest_rows)
    return jnp.zeros((n_dest_rows, d_rows.shape[1]), d_rows.dtype).at[
        cell].add(d_rows, mode="promise_in_bounds")


def _seg_cap(res: int, n_samples: int) -> int:
    """Static per-ray run capacity for segment-dedup (see
    _seg_cell_scatter).  Sized ~2x the typical distinct-cell count of a
    z-ordered sample set at this resolution (probe:
    scripts/probe_segdedup_r3.py — lv0 mean 8/max 11, lv3 mean 42/max 52
    at the online geometry); the runtime cond falls back to the direct
    scatter when a ray exceeds it, so the cap trades speed, not
    correctness."""
    if res <= 16:
        cap = 16
    elif res <= 32:
        cap = 24
    elif res <= 64:
        cap = 40
    else:
        cap = 72
    return min(n_samples, cap)


def _seg_compact(key2d, d_rows2d, cap: int):
    """Run-compaction core shared by the dense and hashed seg scatters.

    key2d: (n_rays, S) int — any per-sample key constant within an
    equal-cell run (dense: the cell id; hashed: a collision-free packed
    grid-coordinate key).  d_rows2d: (n_rays, S, F) updates.
    Returns (rows (n_rays*cap, F) run sums, flat_pos (n_rays*cap,) flat
    sample index of each run's LAST sample, slot_valid (n_rays*cap,),
    fits: scalar bool — every ray's run count <= cap)."""
    n_rays, S = key2d.shape
    F = d_rows2d.shape[-1]
    b = jnp.ones((n_rays, S), bool).at[:, 1:].set(
        key2d[:, 1:] != key2d[:, :-1])
    n_runs = jnp.sum(b, axis=1)
    seg_id = jnp.cumsum(b, axis=1) - 1  # (n_rays, S)

    # (A cumsum-difference formulation — plain prefix sum + two row
    # gathers — measured SLOWER in situ: 45.2 vs 43.5 ms/step, r4 probe.
    # The segmented scan stays; only the rank-count moved to u8.)
    def comb(a, x):
        av, af = a
        xv, xf = x
        return jnp.where(xf[..., None], xv, av + xv), af | xf

    vals, _ = jax.lax.associative_scan(comb, (d_rows2d, b), axis=1)
    sdt = jnp.uint8 if S <= 255 else jnp.int32  # seg_id < S must fit
    ks = jnp.arange(cap, dtype=sdt)
    # index of the last sample of run k = (#samples in runs <= k) - 1
    # (u8 compare-reduce: the (n_rays, cap, S) temp at 1/4 the bytes)
    cnt = jnp.sum(
        (seg_id.astype(sdt)[:, None, :] <= ks[None, :, None]).astype(
            jnp.uint8), axis=2, dtype=jnp.int32)
    end_pos = jnp.clip(cnt - 1, 0, S - 1)  # (n_rays, cap)
    slot_valid = (jnp.arange(cap)[None, :] < n_runs[:, None]).reshape(-1)
    flat_pos = (jnp.arange(n_rays)[:, None] * S + end_pos).reshape(-1)
    rows = vals.reshape(n_rays * S, F)[flat_pos]
    rows = jnp.where(slot_valid[:, None], rows, 0.0)
    return rows, flat_pos, slot_valid, jnp.max(n_runs) <= cap


def _seg_cell_scatter(cell2d, d_rows2d, n_dest_rows: int, cap: int,
                      dest_dtype=None):
    """Segment-dedup scatter-add: samples along a ray are z-ordered, so
    consecutive samples repeat the same cell (~4-24x on the online
    budget's levels).  Pre-sum each equal-cell run with a segmented
    prefix scan and scatter ONE row per run — XLA's TPU scatter charges
    per update row (~13-30 ns, BASELINE.md), so row count is everything.
    Measured: the 4 online levels' scatters 20.7 -> 6.6 ms including all
    machinery (scripts/probe_segdedup_r3.py).

    cell2d: (n_rays, S) int32; d_rows2d: (n_rays, S, F).
    Numerics: each run's sum is the plain left-to-right f32 sum of its
    samples — the same addend set the direct path hands XLA's
    (unspecified-order) scatter-add; results differ only by f32
    reordering.  Rays with more than ``cap`` runs trigger a cond fallback
    to the exact direct scatter (both branches compiled; runtime picks).
    """
    n_rays, S = cell2d.shape
    F = d_rows2d.shape[-1]
    dt = d_rows2d.dtype if dest_dtype is None else dest_dtype

    def seg_path(args):
        cell2d, d_rows2d = args
        # run pre-sum stays f32; only the scattered rows are staged in dt
        rows, flat_pos, slot_valid, _ = _seg_compact(cell2d, d_rows2d, cap)
        cells = jnp.where(slot_valid, cell2d.reshape(-1)[flat_pos], 0)
        return _cell_cache_scatter(cells.astype(jnp.int32), rows.astype(dt),
                                   n_dest_rows)

    def direct_path(args):
        cell2d, d_rows2d = args
        return _cell_cache_scatter(
            cell2d.reshape(-1).astype(jnp.int32),
            d_rows2d.reshape(-1, F).astype(dt), n_dest_rows)

    if cap >= S:  # dedup cannot overflow; also covers tiny-S test shapes
        return seg_path((cell2d, d_rows2d))
    b = jnp.ones((n_rays, S), bool).at[:, 1:].set(
        cell2d[:, 1:] != cell2d[:, :-1])
    fits = jnp.max(jnp.sum(b, axis=1)) <= cap
    return jax.lax.cond(fits, seg_path, direct_path, (cell2d, d_rows2d))


def _hash_encode_cell_bwd(spec, res, g):
    return _cell_bwd_impl(spec, 0, res, g)


def _cell_bwd_impl(spec, n_rays, res, g):
    x, rows_all = res
    C = spec.level_dim
    axes = _axes01(x)
    # one transpose up front: per-channel cotangent reads become contiguous
    # (L*C, N) rows instead of strided columns of the lane-padded (N, L*C)
    gT = g.T
    # per-axis (N,) cotangent accumulators — never an (N, 3) temp in the
    # 32-iteration corner unroll (each would be a 64 MB lane-padded buffer
    # read+written per iteration at the online budget)
    dxa = [jnp.zeros_like(axes[0]) for _ in range(3)]
    d_levels = {}
    # Small dense levels whose VMEM-padded cache fits: their scatters fuse
    # into ONE pallas loop (iteration floor dominates scatter cost — see
    # ops/hashgrid_pallas.py).
    fuse = []  # (li, p, cell, d_rows)
    for li, p in enumerate(spec.level_params()):
        rows = rows_all[li]
        g_cols = [gT[li * C + ch] for ch in range(C)]
        pgs, fracs = _level_fracs(axes, p)
        # d_rows columns + coordinate cotangent in one corner unroll
        d_cols = []
        for ci, c in enumerate(_CORNERS):
            s0, s1, s2 = _corner_sels(fracs, c)
            w = (s0 * s1) * s2
            gdotrow = None
            for ch in range(C):
                d_cols.append(w * g_cols[ch])
                t = g_cols[ch] * rows[:, ci * C + ch]
                gdotrow = t if gdotrow is None else gdotrow + t
            # dw/dx01_k = scale * sign_k * prod_{j != k} sel_j
            for k, others in enumerate(((s1, s2), (s0, s2), (s0, s1))):
                term = (gdotrow * (others[0] * others[1])) * p["scale"]
                dxa[k] = dxa[k] + term if c[k] else dxa[k] - term
        if p["dense"]:
            R = p["res"]
            dt = _lvl_dtype(spec, p)
            if (dt == jnp.bfloat16 and spec.reduce == "pallas"
                    and _pallas_reduce_shape_ok(R, C)):
                reduce_fn = _reduce_cell_cache_grad_pallas_wrap
            elif dt == jnp.bfloat16:
                reduce_fn = _reduce_cell_cache_grad_conv
            else:
                reduce_fn = _reduce_cell_cache_grad
            cell = _cell_of(pgs, R)
            d_rows = jnp.stack(d_cols, axis=-1)  # (N, 8*C) scatter operand
            if spec.scatter == "pallas" and R * R * R <= _PALLAS_FUSE_ROWS:
                fuse.append((li, p, cell, d_rows))
            elif spec.scatter == "seg" and n_rays > 0:
                S = x.shape[0] // n_rays
                # big levels stage the whole compact stream (scan + rows)
                # in bf16: the segmented scan's combine passes move ~4x the
                # level's d_rows bytes, and run sums span only ~2-20
                # samples, so bf16 accumulation stays well inside the
                # table-grad noise floor
                d_cache = _seg_cell_scatter(
                    cell.reshape(n_rays, S),
                    d_rows.reshape(n_rays, S, 8 * C).astype(dt),
                    R * R * R, _seg_cap(R, S))
                d_levels[li] = reduce_fn(d_cache, p, C)
            else:
                d_cache = _cell_cache_scatter(cell, d_rows.astype(dt),
                                              R * R * R)
                d_levels[li] = reduce_fn(d_cache, p, C)
        else:
            # hashed level: flat element scatter (window-C scatter_add
            # measured 400x slower — a pathological XLA emitter; element
            # streams are the fast form for 1-D destinations,
            # scripts/bisect_offline.py).  With ray structure + 'seg',
            # runs of equal GRID CELL (the hashed corner indices are a
            # pure function of pos_grid) pre-sum exactly like the dense
            # path, shrinking the element streams by the dedup ratio.
            def _element_scatter(gx, gy, gz, cols):
                flat_idx = []
                contrib = []
                for ci, c in enumerate(_CORNERS):
                    idx = _corner_index_axes(
                        gx + int(c[0]), gy + int(c[1]), gz + int(c[2]),
                        p["res"], p["size"], p["dense"])
                    base = idx.astype(jnp.int32) * C
                    for ch in range(C):
                        flat_idx.append(base + ch)
                        contrib.append(cols[ci * C + ch])
                return jnp.zeros((p["size"] * C,), cols[0].dtype).at[
                    jnp.concatenate(flat_idx)
                ].add(jnp.concatenate(contrib), mode="promise_in_bounds")

            S = x.shape[0] // n_rays if n_rays > 0 else 0
            cap = _seg_cap(p["res"], S) if S else 0
            if spec.scatter == "seg" and n_rays > 0:
                # collision-free packed grid key (res <= 1289 fits int32)
                K = p["res"] + 2
                key2d = ((pgs[0] * K + pgs[1]) * K + pgs[2]).reshape(
                    n_rays, S)
                d2 = jnp.stack(d_cols, axis=-1).reshape(n_rays, S, 8 * C)

                def seg_path(args):
                    key2d, d2 = args
                    rows, flat_pos, slot_valid, _ = _seg_compact(
                        key2d, d2, cap)
                    gx = jnp.where(slot_valid, pgs[0][flat_pos], 0)
                    gy = jnp.where(slot_valid, pgs[1][flat_pos], 0)
                    gz = jnp.where(slot_valid, pgs[2][flat_pos], 0)
                    cols = [rows[:, k] for k in range(8 * C)]
                    return _element_scatter(gx, gy, gz, cols)

                def direct_path(args):
                    return _element_scatter(pgs[0], pgs[1], pgs[2], d_cols)

                if cap >= S:
                    d_levels[li] = seg_path((key2d, d2))
                else:
                    bmask = jnp.ones((n_rays, S), bool).at[:, 1:].set(
                        key2d[:, 1:] != key2d[:, :-1])
                    fits = jnp.max(jnp.sum(bmask, axis=1)) <= cap
                    d_levels[li] = jax.lax.cond(
                        fits, seg_path, direct_path, (key2d, d2))
            else:
                d_levels[li] = _element_scatter(pgs[0], pgs[1], pgs[2], d_cols)
    if fuse:
        from . import hashgrid_pallas

        d_caches = hashgrid_pallas.fused_cache_scatter(
            [f[2] for f in fuse], [f[3] for f in fuse],
            [f[1]["res"] ** 3 for f in fuse])
        for (li, p, _, _), d_cache in zip(fuse, d_caches):
            d_levels[li] = _reduce_cell_cache_grad(d_cache, p, C)
    d_table = jnp.concatenate([d_levels[li] for li in
                               range(len(spec.level_params()))])
    # chain through x01 = clip((x+1)/2): derivative 0.5 inside, 0 at clip
    inside = (jnp.abs(x) <= 1.0).astype(x.dtype)
    dx = jnp.stack(dxa, axis=-1) * 0.5 * inside
    return dx, d_table


hash_encode_cell.defvjp(_hash_encode_cell_fwd, _hash_encode_cell_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hash_encode_cell_rays(
    x: jnp.ndarray, table: jnp.ndarray, spec: HashGridSpec, n_rays: int
) -> jnp.ndarray:
    """Ray-structured variant of hash_encode_cell: x is (n_rays * S, 3)
    with each ray's S samples contiguous and z-ordered.  When
    spec.scatter == 'seg' the z ordering powers segment-dedup scatters in
    the backward and two-stage run gathers in the forward (bitwise-equal
    rows; table grads differ only by f32 summation order)."""
    return _encode_cell_impl(x, table, spec, n_rays)[0]


def _hash_encode_cell_rays_fwd(x, table, spec, n_rays):
    out, rows_all = _encode_cell_impl(x, table, spec, n_rays)
    return out, (x, rows_all)


def _hash_encode_cell_rays_bwd(spec, n_rays, res, g):
    return _cell_bwd_impl(spec, n_rays, res, g)


hash_encode_cell_rays.defvjp(_hash_encode_cell_rays_fwd,
                             _hash_encode_cell_rays_bwd)


def _pallas_reduce_shape_ok(R: int, C: int) -> bool:
    """Validated shape envelope for the pallas plane-sweep reduce
    (ADVICE r4 #4): the kernel is measured at R in {64, 128}, C = 2.  Off
    that envelope it can OOM VMEM (the in-kernel 2-hot (R*8C, S*C)
    matrices grow ~quadratically in C) or hit unaligned lane dims (R*8C
    not a multiple of 128).  Gate auto-selection to: lane-aligned packed
    plane, and the 2-hot matrix + both plane blocks under a ~6 MB VMEM
    estimate; anything else silently uses the conv reduce."""
    S = R + 1
    fz_bytes = (R * 8 * C) * (S * C) * 2           # one bf16 2-hot matrix
    plane_bytes = R * (R * 8 * C) * 2 * 2 * 2      # 2 blocks, double-buffered
    return ((R * 8 * C) % 128 == 0 and C <= 2
            and fz_bytes + plane_bytes <= 6 * 1024 * 1024)


def _reduce_cell_cache_grad_pallas_wrap(d_cache, p, C: int):
    """Pallas plane-sweep reduce (ops/reduce_pallas.py) with the same
    output contract as the conv reduce: flat (size*C,) f32, channel-
    interleaved.  Differs from conv only by f32 summation order."""
    from .reduce_pallas import reduce_cell_cache_grad_pallas

    S = p["res"] + 1
    flat = reduce_cell_cache_grad_pallas(d_cache, R=p["res"], C=C)
    if S * S * S < p["size"]:
        flat = jnp.pad(flat, (0, (p["size"] - S * S * S) * C))
    return flat


def resolve_reduce(pref: str = "auto", dp_devices: int = 1) -> str:
    """Resolve the spec.reduce knob (bf16 big-level cache-grad reduce).

    "auto" = "pallas" on a single-device TPU backend (one pass over the
    cache, 2.4x the conv reduce at lv3), "conv" otherwise: the pallas
    custom call cannot be GSPMD-partitioned, and on CPU the Mosaic
    kernel does not lower."""
    if pref != "auto":
        if pref == "pallas" and dp_devices > 1:
            import warnings

            warnings.warn(
                "hash_reduce='pallas' cannot be GSPMD-partitioned; forcing "
                f"'conv' for dp_devices={dp_devices}", stacklevel=2)
            return "conv"
        return pref
    if dp_devices > 1:
        return "conv"
    import jax as _jax

    return "pallas" if _jax.default_backend() == "tpu" else "conv"


def resolve_scatter(pref: str = "auto", dp_devices: int = 1) -> str:
    """Resolve the spec.scatter knob.

    "auto" = "seg": segment-dedup scatters + two-stage run gathers on
    ray-structured batches (train step 69 -> 53 ms at the online budget,
    round-3 probes); callers without ray structure transparently use the
    per-sample path, and a runtime cond falls back to it when a ray
    exceeds the run cap — so "seg" is safe everywhere, differing from
    "xla" only by f32 summation order in the table gradient.  "xla" = the
    bitwise-deterministic per-sample path.  "pallas" = the fused VMEM
    scatter kernel, kept selectable as a measured reference point; it
    cannot be GSPMD-partitioned, so sharded (dp_devices > 1) programs are
    forced back with a warning."""
    if pref == "pallas" and dp_devices > 1:
        import warnings

        warnings.warn(
            "hash_scatter='pallas' cannot be GSPMD-partitioned; forcing "
            f"'xla' for dp_devices={dp_devices}", stacklevel=2)
        return "xla"
    if pref != "auto":
        return pref
    return "seg"


def encode(x: jnp.ndarray, table: jnp.ndarray, spec: HashGridSpec,
           n_rays: int = 0) -> jnp.ndarray:
    """Dispatch on spec.layout (static) — the single entry point callers use.

    ``n_rays`` > 0 declares that x is (n_rays * S, 3) with each ray's
    z-ordered samples contiguous, enabling the segment-dedup backward
    (spec.scatter == 'seg').  Callers without ray structure (mesh
    extraction, arbitrary point queries) leave it 0."""
    if spec.layout == "cell":
        if n_rays > 0 and x.shape[0] % n_rays == 0:
            return hash_encode_cell_rays(x, table, spec, n_rays)
        return hash_encode_cell(x, table, spec)
    return hash_encode(x, table, spec)
