"""Mesh appearance baking.

The reference bakes a UV texture atlas via xatlas unwrap + pyrender
rasterization + a CUDA barycentric-UV kernel
(nerf_runner.py:1467-1541 mesh_texture_from_train_images,
mycuda rayColorToTextureImageCUDA).  xatlas/pyrender are unavailable here,
so this module re-implements the full path from scratch:

  * ``bake_texture_from_train_images`` — a compact charted UV unwrap
    (``_charted_atlas``, xatlas-equivalent: greedy normal-clustered chart
    growth, planar parameterization, shelf packing) with a zero-failure
    per-face triangle atlas fallback (``_triangle_atlas``), occlusion via
    the native C++ z-buffer rasterizer, and a weighted texel bake;
  * the reference's vertex-color variants
    (nerf_runner.py:1411-1464 mesh_vertex_color_from_train_images /
    _from_nerf): ``bake_vertex_colors`` projects mesh vertices into each
    training view with depth-visibility checks, and
    ``vertex_colors_from_field`` queries the NOF color head directly.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models import nof as nof_model
from ..utils import mesh as mesh_utils


def bake_vertex_colors(
    mesh: mesh_utils.Mesh,
    nof_runner,
    rgbs: np.ndarray,
    depths: np.ndarray,
    masks: np.ndarray,
    cam_in_obs: np.ndarray,
    K: np.ndarray,
    depth_tol: float = 0.01,
) -> mesh_utils.Mesh:
    """Weighted vertex colors from training images (real-world mesh +
    real-scale CV-convention cam poses)."""
    V = mesh.vertices  # (n, 3) in object frame, real scale
    n = len(V)
    acc = np.zeros((n, 3))
    wacc = np.zeros(n)
    H, W = depths.shape[1:3]
    for i in range(len(rgbs)):
        ob_in_cam = np.linalg.inv(cam_in_obs[i])
        pc = V @ ob_in_cam[:3, :3].T + ob_in_cam[:3, 3]
        z = pc[:, 2]
        u = np.round(K[0, 0] * pc[:, 0] / np.maximum(z, 1e-6) + K[0, 2]).astype(int)
        v = np.round(K[1, 1] * pc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]).astype(int)
        ok = (z > 0.05) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        uu = np.clip(u, 0, W - 1)
        vv = np.clip(v, 0, H - 1)
        d_img = depths[i][vv, uu]
        visible = ok & (d_img > 0.1) & (np.abs(d_img - z) < depth_tol)
        visible &= masks[i][vv, uu] > 0
        w = visible.astype(np.float64) / np.maximum(z, 1e-6)
        col = rgbs[i][vv, uu]
        if col.max() > 1.5:
            col = col / 255.0
        acc += col * w[:, None]
        wacc += w
    colors = np.where(wacc[:, None] > 0, acc / np.maximum(wacc[:, None], 1e-9), 0.5)
    out = mesh.copy()
    out.vertex_colors = (colors * 255).astype(np.uint8)
    return out


def vertex_colors_from_field(
    mesh_normalized: mesh_utils.Mesh, nof_runner, view_dir=(0.0, 0.0, 1.0)
) -> np.ndarray:
    """Query the NOF color head at the vertices (normalized-space mesh),
    fixed viewing direction (reference mesh_vertex_color_from_nerf)."""
    pts = jnp.asarray(mesh_normalized.vertices, dtype=jnp.float32)
    dirs = jnp.broadcast_to(
        jnp.asarray(view_dir, dtype=jnp.float32), (len(mesh_normalized.vertices), 3)
    )
    fids = jnp.zeros(len(mesh_normalized.vertices), dtype=jnp.int32)
    raw, _ = nof_model.nof_forward(
        nof_runner.params, nof_runner.spec, pts[:, None, :], dirs, fids
    )
    rgb = np.asarray(jax.nn.sigmoid(raw[:, 0, :3]))
    return (rgb * 255).astype(np.uint8)


# ---------------------------------------------------------------- UV bake
def _charted_atlas(vertices, faces, face_normals, tex_size: int,
                   cos_thresh: float = 0.7, gutter: int = 2):
    """xatlas-style compact unwrap (reference nerf_runner.py:1467-1541 uses
    xatlas via trimesh; unavailable here, re-implemented from scratch):

    1. greedy chart growth over the face-adjacency graph, admitting a
       neighbor when its normal stays within ``cos_thresh`` of the chart's
       area-weighted normal (keeps the planar projection near-injective);
    2. per-chart planar parameterization in the chart normal's tangent
       basis;
    3. global texel density chosen from total chart area, shelf-packing of
       chart rectangles (sorted by height) with a ``gutter`` texel border,
       density backoff until everything fits;
    4. vectorized texel rasterization per chart (half-plane barycentrics,
       tolerant edge band against seam cracks) + one dilation pass into the
       background to pad seams.

    Returns the same triple as _triangle_atlas: (uv (F, 3, 2) in [0, 1],
    face_of (T, T) int32 -1, bary_of (T, T, 3) float32).  Unlike the
    per-face atlas, texels are spent proportionally to surface area and
    chart interiors are seam-free.
    """
    F = len(faces)
    # ---- adjacency from shared edges
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    owner = np.tile(np.arange(F), 3)
    order = np.lexsort((e[:, 1], e[:, 0]))
    es, os_ = e[order], owner[order]
    same = np.all(es[1:] == es[:-1], axis=1)
    nbr = [[] for _ in range(F)]
    for a, b in zip(os_[:-1][same], os_[1:][same]):
        nbr[a].append(b)
        nbr[b].append(a)

    tri = vertices[faces]                                  # (F, 3, 3)
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)

    # ---- smoothed normals for CLUSTERING only (the parameterization uses
    # the true geometry).  Marching-tets meshes have per-face normal noise
    # well past any sane admission angle; two 1-ring averaging passes give
    # the underlying surface orientation.
    pa, pb = os_[:-1][same], os_[1:][same]                 # adjacent pairs
    sn = face_normals * area[:, None]
    for _ in range(2):
        acc = sn.copy()
        np.add.at(acc, pa, sn[pb])
        np.add.at(acc, pb, sn[pa])
        sn = acc / np.maximum(
            np.linalg.norm(acc, axis=1, keepdims=True), 1e-12)

    # ---- greedy chart growth.  BFS (deque) keeps charts round — a DFS
    # frontier grows stringy charts whose bounding rects pack terribly.
    from collections import deque

    max_chart = max(64, F // 16)
    chart_of = np.full(F, -1, np.int64)
    n_charts = 0
    for seed in np.argsort(-area):                         # big faces seed
        if chart_of[seed] >= 0:
            continue
        cid = n_charts
        n_charts += 1
        chart_of[seed] = cid
        n_members = 1
        n_acc = sn[seed] * area[seed]
        frontier = deque(nbr[seed])
        while frontier and n_members < max_chart:
            f = frontier.popleft()
            if chart_of[f] >= 0:
                continue
            cn = n_acc / max(np.linalg.norm(n_acc), 1e-12)
            # admission by SMOOTHED normal (marching-tets noise), but the
            # RAW normal must also face the chart plane: a face whose true
            # normal opposes the projection axis would project with a
            # negative Jacobian — a fold (ADVICE r4 #1).
            if float(sn[f] @ cn) < cos_thresh or \
                    float(face_normals[f] @ cn) < 0.05:
                continue
            chart_of[f] = cid
            n_members += 1
            n_acc = n_acc + sn[f] * area[f]
            frontier.extend(nbr[f])

    # ---- absorb small charts into their most-adjacent neighbor chart
    # (xatlas's small-chart merge): every chart costs a gutter-padded rect,
    # and a noisy mesh otherwise produces tens of thousands of singletons
    # that can never pack.
    min_chart = 8
    for _ in range(4):
        ca, cb = chart_of[pa], chart_of[pb]
        cnt = np.bincount(chart_of, minlength=n_charts)
        small = cnt < min_chart
        cross = ca != cb
        if not (small[ca[cross]] | small[cb[cross]]).any():
            break
        # for each small chart, the neighbor chart sharing the most edges
        from collections import Counter, defaultdict

        votes = defaultdict(Counter)
        for x, y in ((ca[cross], cb[cross]), (cb[cross], ca[cross])):
            for s, t in zip(x, y):
                if small[s]:
                    votes[s][t] += 1
        remap = np.arange(n_charts)
        for s, c in votes.items():
            remap[s] = c.most_common(1)[0][0]
        # resolve chains (small -> small -> big) one hop per outer iter
        chart_of = remap[chart_of]

    uniq, chart_of = np.unique(chart_of, return_inverse=True)
    order_f = np.argsort(chart_of, kind="stable")
    bounds = np.searchsorted(chart_of[order_f], np.arange(len(uniq) + 1))
    charts = [order_f[bounds[c]:bounds[c + 1]] for c in range(len(uniq))]

    # ---- per-chart planar parameterization + fold split.  The projection
    # axis is the chart's area-weighted RAW normal; any member whose
    # projected triangle has non-positive signed area is folded (flipped
    # Jacobian) and its UV triangle would overlap neighbors, silently
    # baking wrong colors (ADVICE r4 #1).  Folded faces are evicted into
    # singleton charts parameterized in their own normal's basis, where
    # the projection is exact.
    def _basis(n):
        t1 = np.cross(n, [0.0, 0.0, 1.0])
        if np.linalg.norm(t1) < 1e-6:
            t1 = np.cross(n, [0.0, 1.0, 0.0])
        t1 /= np.linalg.norm(t1)
        return np.stack([t1, np.cross(n, t1)], axis=1)     # (3, 2)

    kept_charts = []
    folded: list[int] = []
    for members in charts:
        n = (face_normals[members] * area[members, None]).sum(0)
        n = n / max(np.linalg.norm(n), 1e-12)
        p = tri[members] @ _basis(n)                       # (m, 3, 2)
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        sa = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]     # 2x signed area
        bad = sa <= 1e-12 * np.maximum(area[members], 1e-12)
        if bad.any():
            folded.extend(members[bad].tolist())
            members = members[~bad]
        if len(members):
            kept_charts.append(members)
    charts = kept_charts + [np.array([f]) for f in folded]

    uv3 = np.zeros((F, 3, 2))
    sizes = np.zeros((len(charts), 2))
    for cid, members in enumerate(charts):
        if len(members) == 1:
            n = face_normals[members[0]]
        else:
            n = (face_normals[members] * area[members, None]).sum(0)
        n = n / max(np.linalg.norm(n), 1e-12)
        p = tri[members] @ _basis(n)                       # (m, 3, 2)
        lo = p.reshape(-1, 2).min(0)
        uv3[members] = p - lo
        sizes[cid] = p.reshape(-1, 2).max(0) - lo

    # ---- density + shelf packing: back off until it fits, then grow the
    # density greedily so the atlas is as full as the packer allows
    def _try_pack(density):
        w = np.ceil(sizes[:, 0] * density).astype(np.int64) + 2 * gutter + 1
        h = np.ceil(sizes[:, 1] * density).astype(np.int64) + 2 * gutter + 1
        if w.max(initial=0) > tex_size or h.max(initial=0) > tex_size:
            return None
        order = np.argsort(-h)
        offs = np.zeros((len(charts), 2), np.int64)
        x = y = shelf_h = 0
        for cid in order:
            if x + w[cid] > tex_size:                      # new shelf
                y += shelf_h
                x = shelf_h = 0
            if y + h[cid] > tex_size:
                return None
            offs[cid] = (x, y)
            x += w[cid]
            shelf_h = max(shelf_h, int(h[cid]))
        return offs

    total_area = float(area.sum())
    density = 0.9 * tex_size / max(np.sqrt(total_area), 1e-12)
    offs = _try_pack(density)
    for _ in range(20):
        if offs is not None:
            break
        density *= 0.8
        offs = _try_pack(density)
    else:
        raise ValueError("charted atlas: packing failed")
    for _ in range(16):
        trial = _try_pack(density * 1.12)
        if trial is None:
            break
        density *= 1.12
        offs = trial

    uv = np.zeros((F, 3, 2))
    for cid, members in enumerate(charts):
        uv[members] = uv3[members] * density + offs[cid] + gutter

    # ---- rasterize texels: faces bucketed by bbox size, each bucket
    # vectorized as (faces, bh, bw) half-plane tests (ADVICE r4 #3 — the
    # per-face Python loop was minutes of host work at global-refine face
    # counts).  Two passes keep the loop's overwrite semantics sound:
    # strict-inside texels first (fold-free charts never overlap, so
    # overwrites only happen inside the tolerant seam band), then the
    # tolerant band fills still-empty texels only.
    face_of = np.full((tex_size, tex_size), -1, np.int32)
    bary_of = np.zeros((tex_size, tex_size, 3), np.float32)
    fx0 = np.maximum(np.floor(uv[:, :, 0].min(1)).astype(np.int64) - 1, 0)
    fx1 = np.minimum(np.ceil(uv[:, :, 0].max(1)).astype(np.int64) + 1,
                     tex_size - 1)
    fy0 = np.maximum(np.floor(uv[:, :, 1].min(1)).astype(np.int64) - 1, 0)
    fy1 = np.minimum(np.ceil(uv[:, :, 1].max(1)).astype(np.int64) + 1,
                     tex_size - 1)
    av, bv, cv = uv[:, 0], uv[:, 1], uv[:, 2]
    dz = ((bv[:, 0] - av[:, 0]) * (cv[:, 1] - av[:, 1])
          - (cv[:, 0] - av[:, 0]) * (bv[:, 1] - av[:, 1]))
    fok = (fx1 >= fx0) & (fy1 >= fy0) & (np.abs(dz) >= 1e-12)
    bw_all = np.where(fok, fx1 - fx0 + 1, 1)
    bh_all = np.where(fok, fy1 - fy0 + 1, 1)
    size_cls = np.maximum(
        np.ceil(np.log2(bw_all)), np.ceil(np.log2(bh_all))).astype(np.int64)

    def _raster_pass(sel, tolerant: bool):
        n = len(sel)
        if n == 0:
            return
        B = 1 << int(size_cls[sel].max())
        # chunk so the (chunk, B, B) temps stay ~tens of MB
        step = max(1, (1 << 22) // (B * B))
        for s in range(0, n, step):
            fs = sel[s:s + step]
            px = fx0[fs, None, None] + np.arange(B)[None, None, :]
            py = fy0[fs, None, None] + np.arange(B)[None, :, None]
            inbb = (px <= fx1[fs, None, None]) & (py <= fy1[fs, None, None])
            pxf, pyf = px + 0.0, py + 0.0
            ax, ay = av[fs, 0, None, None], av[fs, 1, None, None]
            bx, by = bv[fs, 0, None, None], bv[fs, 1, None, None]
            cx, cy = cv[fs, 0, None, None], cv[fs, 1, None, None]
            d = dz[fs, None, None]
            w0 = ((bx - pxf) * (cy - pyf) - (cx - pxf) * (by - pyf)) / d
            w1 = ((cx - pxf) * (ay - pyf) - (ax - pxf) * (cy - pyf)) / d
            w2 = 1.0 - w0 - w1
            strict = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & inbb
            if tolerant:
                # tolerant band (~half texel) closes seam cracks
                eps = -0.5 / np.maximum(
                    np.abs(bx - ax) + np.abs(by - ay), 1.0)
                hit = ((w0 >= eps) & (w1 >= eps) & (w2 >= eps) & inbb
                       & ~strict)
            else:
                hit = strict
            fi, ys, xs = np.nonzero(hit)
            if not len(fi):
                continue
            ty = fy0[fs][fi] + ys
            tx = fx0[fs][fi] + xs
            if tolerant:
                keep = face_of[ty, tx] < 0
                fi, ys, xs, ty, tx = (fi[keep], ys[keep], xs[keep],
                                      ty[keep], tx[keep])
                if not len(fi):
                    continue
            w = np.clip(np.stack(
                [w0[fi, ys, xs], w1[fi, ys, xs], w2[fi, ys, xs]], -1),
                0, None)
            w /= np.maximum(w.sum(-1, keepdims=True), 1e-9)
            face_of[ty, tx] = np.asarray(fs)[fi]
            bary_of[ty, tx] = w.astype(np.float32)

    fsel = np.nonzero(fok)[0]
    for cls in np.unique(size_cls[fsel]):
        _raster_pass(fsel[size_cls[fsel] == cls], tolerant=False)
    for cls in np.unique(size_cls[fsel]):
        _raster_pass(fsel[size_cls[fsel] == cls], tolerant=True)

    # ---- one dilation pass pads chart borders into the gutter
    empty = face_of < 0
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        src_f = np.roll(face_of, (dy, dx), (0, 1))
        src_b = np.roll(bary_of, (dy, dx), (0, 1))
        take = empty & (src_f >= 0)
        face_of[take] = src_f[take]
        bary_of[take] = src_b[take]
        empty = face_of < 0

    return uv / tex_size, face_of, bary_of


def _triangle_atlas(n_faces: int, tex_size: int, cell: int):
    """Trivial per-face UV atlas: two right triangles per cell x cell texel
    square (replaces xatlas unwrap — lower quality seams, zero deps).

    Vectorized over faces: both triangle parities have translation-invariant
    texel masks and barycentrics, so they are computed once per parity and
    broadcast-scattered for all faces at that parity.

    Returns (uv (n_faces, 3, 2) in [0,1], texel tables:
    face_of_texel (T, T) int32 -1, bary_of_texel (T, T, 3))."""
    cols = tex_size // cell
    pad = 1  # interior padding in texels to avoid bleeding
    f = np.arange(n_faces)
    cidx = f // 2
    r, c = cidx // cols, cidx % cols
    if n_faces and (r.max() + 1) * cell > tex_size:
        raise ValueError(
            f"atlas overflow: {n_faces} faces need cell {cell} cols {cols}"
        )
    x0, y0 = c * cell, r * cell

    # local corners per parity (lower-left / upper-right right triangle)
    lo = np.array([[pad, pad], [cell - 1 - pad, pad],
                   [pad, cell - 1 - pad]], np.float64)
    hi = np.array([[cell - 1 - pad, cell - 1 - pad], [pad, cell - 1 - pad],
                   [cell - 1 - pad, pad]], np.float64)
    even = (f % 2 == 0)
    corners = np.where(even[:, None, None], lo[None], hi[None])
    uv = (corners + np.stack([x0, y0], -1)[:, None, :]) / tex_size

    face_of = np.full((tex_size, tex_size), -1, np.int32)
    bary_of = np.zeros((tex_size, tex_size, 3), np.float32)
    jj, ii = np.meshgrid(np.arange(cell), np.arange(cell), indexing="ij")
    lower = ii + jj <= cell - 1

    for parity, m, crn in ((0, lower, lo), (1, ~lower, hi)):
        ys, xs = np.nonzero(m)
        px, py = xs + 0.0, ys + 0.0
        ax, ay = crn[0]; bx, by = crn[1]; cx, cy = crn[2]
        d = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
        w0 = ((bx - px) * (cy - py) - (cx - px) * (by - py)) / d
        w1 = ((cx - px) * (ay - py) - (ax - px) * (cy - py)) / d
        w2 = 1.0 - w0 - w1
        keep = (w0 > -0.3) & (w1 > -0.3) & (w2 > -0.3)
        w = np.clip(np.stack([w0, w1, w2], -1), 0, None)
        w = (w / np.maximum(w.sum(-1, keepdims=True), 1e-9))[keep]
        fp = f[f % 2 == parity]
        Ys = y0[fp][:, None] + ys[keep][None, :]
        Xs = x0[fp][:, None] + xs[keep][None, :]
        face_of[Ys, Xs] = fp[:, None]
        bary_of[Ys, Xs] = w[None, :].astype(np.float32)
    return uv, face_of, bary_of


def bake_texture_from_train_images(
    mesh: mesh_utils.Mesh,
    rgbs: np.ndarray,
    depths: np.ndarray,
    masks: np.ndarray,
    cam_in_obs: np.ndarray,
    K: np.ndarray,
    tex_size: int = 1024,
    depth_tol: float = 0.01,
    atlas: str = "charted",
):
    """Full UV texture atlas baked from training views (reference
    mesh_texture_from_train_images nerf_runner.py:1467-1541: xatlas unwrap
    + pyrender depth rasterize + rayColorToTextureImageCUDA barycentric
    bake -> weighted texel average).  Here: a from-scratch charted unwrap
    (``atlas="charted"``, xatlas-equivalent compact packing) or the
    per-face triangle atlas (``atlas="triangle"``, zero-failure fallback) +
    native C++ z-buffer rasterizer for occlusion + vectorized texel bake.

    Returns (mesh_with_uv, texture (T, T, 3) uint8).  mesh gains
    ``face_uv`` (F, 3, 2).
    """
    from .. import native

    F = len(mesh.faces)
    if atlas == "charted":
        try:
            uv, face_of, bary_of = _charted_atlas(
                mesh.vertices, mesh.faces, mesh.face_normals, tex_size)
        except Exception as e:  # noqa: BLE001 — the triangle atlas is the
            # advertised zero-failure path; ANY degenerate-input failure
            # (packing ValueError, NaN vertices hitting LinAlgError, empty
            # meshes hitting IndexError) must fall back, not crash the bake
            # (ADVICE r4 #2)
            import logging

            logging.warning("charted atlas failed (%s); falling back to "
                            "triangle atlas", e)
            atlas = "triangle"
    if atlas == "triangle":
        cell = max(
            4, int(np.floor(tex_size / np.ceil(np.sqrt(np.ceil(F / 2))))))
        cell = min(cell, 64)
        # Auto-grow the atlas when even the minimum cell can't fit every
        # face (the reference's xatlas repacks at whatever resolution it's
        # given; a dense global-refine mesh can exceed 2 faces/16 texels
        # at 1024²).
        need_cols = int(np.ceil(np.sqrt(np.ceil(F / 2))))
        if (tex_size // cell) < need_cols:
            tex_size = cell * need_cols
        uv, face_of, bary_of = _triangle_atlas(F, tex_size, cell)

    ys, xs = np.nonzero(face_of >= 0)
    f_id = face_of[ys, xs]                     # (M,)
    bary = bary_of[ys, xs]                     # (M, 3)
    tri = mesh.vertices[mesh.faces[f_id]]      # (M, 3, 3)
    pts = np.einsum("mk,mkc->mc", bary, tri)   # (M, 3) object-frame texel pts
    nrm = mesh.face_normals[f_id]              # (M, 3)

    H, W = depths.shape[1:3]
    acc = np.zeros((len(pts), 3))
    wacc = np.zeros(len(pts))
    use_native = native.available()
    for i in range(len(rgbs)):
        ob_in_cam = np.linalg.inv(cam_in_obs[i])
        if use_native:
            rdepth, _, _ = native.rasterize(
                mesh.vertices, mesh.faces, K, ob_in_cam, H, W
            )
        else:
            rdepth = depths[i]
        pc = pts @ ob_in_cam[:3, :3].T + ob_in_cam[:3, 3]
        z = pc[:, 2]
        u = np.round(K[0, 0] * pc[:, 0] / np.maximum(z, 1e-6) + K[0, 2]).astype(int)
        v = np.round(K[1, 1] * pc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]).astype(int)
        ok = (z > 0.01) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        uu = np.clip(u, 0, W - 1); vv = np.clip(v, 0, H - 1)
        # self-occlusion: texel visible iff its depth matches the rasterized
        # front surface
        visible = ok & (np.abs(rdepth[vv, uu] - z) < depth_tol)
        if masks is not None:
            visible &= masks[i][vv, uu] > 0
        # view-quality weight: cosine of face normal vs view ray
        n_cam = nrm @ ob_in_cam[:3, :3].T
        view = pc / np.maximum(np.linalg.norm(pc, axis=-1, keepdims=True), 1e-9)
        cosw = np.clip(-(n_cam * view).sum(-1), 0.0, 1.0)
        w = visible * cosw
        col = rgbs[i][vv, uu]
        if col.max() > 1.5:
            col = col / 255.0
        acc += col * w[:, None]
        wacc += w
    texel_rgb = np.where(wacc[:, None] > 0, acc / np.maximum(wacc[:, None], 1e-9), 0.5)

    tex = np.full((tex_size, tex_size, 3), 128, np.uint8)
    tex[ys, xs] = (texel_rgb * 255).astype(np.uint8)
    out = mesh.copy()
    out.face_uv = uv
    return out, tex


def export_textured_obj(mesh: mesh_utils.Mesh, tex: np.ndarray, path: str):
    """OBJ + MTL + PNG export of a UV-textured mesh (reference
    textured_mesh.obj output, bundlesdf.py:765)."""
    import cv2

    base = path[:-4] if path.endswith(".obj") else path
    name = base.split("/")[-1]
    cv2.imwrite(f"{base}.png", mesh_tex_bgr := tex[::-1, :, ::-1])  # V-flip for OBJ
    with open(f"{base}.mtl", "w") as f:
        f.write(f"newmtl material_0\nKd 1 1 1\nmap_Kd {name}.png\n")
    with open(f"{base}.obj", "w") as f:
        f.write(f"mtllib {name}.mtl\nusemtl material_0\n")
        for v in mesh.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for fuv in mesh.face_uv:
            for uvi in fuv:
                f.write(f"vt {uvi[0]} {uvi[1]}\n")
        for i, face in enumerate(mesh.faces):
            a, b, c = face + 1
            t = 3 * i + 1
            f.write(f"f {a}/{t} {b}/{t + 1} {c}/{t + 2}\n")
