"""Host-side mesh utilities: iso-surface extraction, component filtering,
PLY/OBJ export.

The reference uses skimage.measure.marching_cubes + trimesh
(nerf_runner.py:1349-1408 extract_mesh, Utils.py trimesh_split/clean).
Neither ships in this image, so we implement iso-surfacing from scratch as
vectorized **marching tetrahedra** over a Freudenthal 6-tet decomposition
(no large case tables needed; watertight via edge-keyed vertex dedup), plus
face-graph connected components (scipy.sparse.csgraph) and minimal
exporters.  A C++ fast path can slot in underneath later; this numpy
version is fully vectorized and runs once per mesh request (off the hot
path).
"""
from __future__ import annotations

import numpy as np
from scipy.sparse import coo_matrix
from scipy.sparse.csgraph import connected_components as _cc


class Mesh:
    """Minimal triangle-mesh container (vertices (N,3), faces (M,3) int)."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray,
                 vertex_colors: np.ndarray | None = None):
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.faces = np.asarray(faces, dtype=np.int64)
        self.vertex_colors = vertex_colors

    def copy(self) -> "Mesh":
        vc = None if self.vertex_colors is None else self.vertex_colors.copy()
        return Mesh(self.vertices.copy(), self.faces.copy(), vc)

    def apply_transform(self, T: np.ndarray) -> "Mesh":
        self.vertices = self.vertices @ T[:3, :3].T + T[:3, 3]
        return self

    def export(self, path: str):
        if path.endswith(".obj"):
            export_obj(self, path)
        else:
            export_ply(self, path)

    @property
    def face_normals(self) -> np.ndarray:
        v = self.vertices
        f = self.faces
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        ln = np.linalg.norm(n, axis=-1, keepdims=True)
        return n / np.maximum(ln, 1e-12)

    def sample_surface(self, n: int, seed: int = 0) -> np.ndarray:
        """Area-weighted uniform surface samples (replacement for
        trimesh.sample.sample_surface used by benchmark_ho3d.py:121)."""
        rng = np.random.default_rng(seed)
        v, f = self.vertices, self.faces
        tri = v[f]
        areas = 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
        )
        if areas.sum() <= 0:
            return v[rng.integers(0, len(v), n)]
        probs = areas / areas.sum()
        idx = rng.choice(len(f), size=n, p=probs)
        r1 = np.sqrt(rng.random(n))
        r2 = rng.random(n)
        a, b, c = tri[idx, 0], tri[idx, 1], tri[idx, 2]
        return (1 - r1)[:, None] * a + (r1 * (1 - r2))[:, None] * b + (r1 * r2)[:, None] * c


# Freudenthal decomposition: 6 tets per cube, all sharing diagonal 0-7.
# Cube corners indexed by bitmask (x -> bit0, y -> bit1, z -> bit2).
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 1, 5, 7],
        [0, 2, 3, 7],
        [0, 2, 6, 7],
        [0, 4, 5, 7],
        [0, 4, 6, 7],
    ],
    dtype=np.int64,
)
_CORNER_OFFSETS = np.array(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], dtype=np.int64
)
# Tet edges (local vertex index pairs) in a fixed order.
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int64)


def _tet_case_table():
    """For each of 16 inside-bitmask cases, list triangles as triples of tet
    edge ids (-1 padded, up to 2 triangles).  Generated programmatically.

    Orientation: triangles are ordered so their normal points from the
    inside (value < iso) region toward outside, by construction from the
    inside-vertex ordering; exactness of orientation is validated in tests
    against analytic normals.
    """
    edge_lookup = {tuple(sorted(e)): i for i, e in enumerate(_TET_EDGES.tolist())}

    def E(a, b):
        return edge_lookup[tuple(sorted((a, b)))]

    table = -np.ones((16, 2, 3), dtype=np.int64)
    for case in range(16):
        inside = [v for v in range(4) if case >> v & 1]
        outside = [v for v in range(4) if not (case >> v & 1)]
        if len(inside) == 1:
            a = inside[0]
            o = outside
            table[case, 0] = [E(a, o[0]), E(a, o[1]), E(a, o[2])]
        elif len(inside) == 3:
            c = outside[0]
            i = inside
            # mirror of the 1-inside case with flipped winding
            table[case, 0] = [E(c, i[0]), E(c, i[2]), E(c, i[1])]
        elif len(inside) == 2:
            a, b = inside
            c1, c2 = outside
            q = [E(a, c1), E(a, c2), E(b, c2), E(b, c1)]
            table[case, 0] = [q[0], q[1], q[2]]
            table[case, 1] = [q[0], q[2], q[3]]
    return table


_CASE_TABLE = _tet_case_table()


def marching_tetrahedra(
    values: np.ndarray,
    iso: float = 0.0,
    origin=(-1.0, -1.0, -1.0),
    spacing: float | np.ndarray = None,
    mask: np.ndarray | None = None,
) -> Mesh:
    """Extract the iso-surface of a scalar grid.

    Args:
      values: (R0, R1, R2) scalar field sampled at lattice points.
      iso: iso-value (0 for SDF).
      origin: world position of lattice point (0,0,0).
      spacing: scalar or (3,) lattice spacing; default maps the grid to
        [-1,1]^3.
      mask: optional (R0, R1, R2) bool — cells having any unmasked corner
        are skipped (the occupancy-culling the reference gets from its
        octree query, nerf_runner.py:1361-1380).
    Returns: Mesh (possibly empty).
    """
    values = np.asarray(values, dtype=np.float64)
    R = np.array(values.shape)
    if spacing is None:
        spacing = 2.0 / (R - 1)
    spacing = np.broadcast_to(np.asarray(spacing, dtype=np.float64), (3,))
    origin = np.asarray(origin, dtype=np.float64)

    # Cell base lattice coords.
    nc = R - 1
    ii, jj, kk = np.meshgrid(
        np.arange(nc[0]), np.arange(nc[1]), np.arange(nc[2]), indexing="ij"
    )
    base = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)  # (C, 3)

    if mask is not None:
        corner_ok = np.ones(len(base), dtype=bool)
        for off in _CORNER_OFFSETS:
            c = base + off
            corner_ok &= mask[c[:, 0], c[:, 1], c[:, 2]]
        base = base[corner_ok]
    if len(base) == 0:
        return Mesh(np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64))

    # Quick cull: only keep cells whose corner values straddle iso.
    vals8 = np.stack(
        [values[(base + off)[:, 0], (base + off)[:, 1], (base + off)[:, 2]]
         for off in _CORNER_OFFSETS],
        axis=-1,
    )  # (C, 8)
    straddle = (vals8.min(axis=-1) < iso) & (vals8.max(axis=-1) >= iso)
    base = base[straddle]
    vals8 = vals8[straddle]
    if len(base) == 0:
        return Mesh(np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64))

    C = len(base)
    # Global lattice corner ids per cell corner: (C, 8, 3)
    corners = base[:, None, :] + _CORNER_OFFSETS[None]

    tris_edges = []  # list of (n_tris, 3, 2, 3) lattice endpoint coords
    tris_vals = []   # list of (n_tris, 3, 2) endpoint values
    for tet in _TETS:
        tv = vals8[:, tet]  # (C, 4)
        tc = corners[:, tet]  # (C, 4, 3)
        case = ((tv < iso) * (1 << np.arange(4))[None]).sum(axis=-1)  # (C,)
        for t in range(2):
            tri_edge_ids = _CASE_TABLE[case, t]  # (C, 3)
            ok = tri_edge_ids[:, 0] >= 0
            if not ok.any():
                continue
            te = tri_edge_ids[ok]  # (Ct, 3) edge ids
            ep = _TET_EDGES[te]  # (Ct, 3, 2) local tet-vertex pairs
            cc = tc[ok]  # (Ct, 4, 3)
            vv = tv[ok]  # (Ct, 4)
            ends = np.take_along_axis(
                cc[:, None, None, :, :].repeat(3, 1).repeat(2, 2),
                ep[..., None, None].repeat(3, -1),
                axis=3,
            )[:, :, :, 0, :]  # (Ct, 3, 2, 3)
            evals = np.take_along_axis(
                vv[:, None, None, :].repeat(3, 1).repeat(2, 2), ep[..., None], axis=3
            )[:, :, :, 0]  # (Ct, 3, 2)
            tris_edges.append(ends)
            tris_vals.append(evals)

    if not tris_edges:
        return Mesh(np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int64))
    ends = np.concatenate(tris_edges)  # (T, 3, 2, 3) int lattice coords
    evals = np.concatenate(tris_vals)  # (T, 3, 2)

    # Canonical edge keys: sort the two endpoints lexicographically.
    flat_ends = ends.reshape(-1, 2, 3)
    flat_vals = evals.reshape(-1, 2)
    lin = (flat_ends[..., 0] * R[1] + flat_ends[..., 1]) * R[2] + flat_ends[..., 2]
    swap = lin[:, 0] > lin[:, 1]
    flat_ends[swap] = flat_ends[swap][:, ::-1]
    flat_vals[swap] = flat_vals[swap][:, ::-1]
    lin = np.sort(lin, axis=1)
    keys = lin[:, 0] * (R.prod()) + lin[:, 1]
    uniq, inv = np.unique(keys, return_inverse=True)

    # Interpolated vertex positions per unique edge.
    first = np.zeros(len(uniq), dtype=np.int64)
    first[inv[::-1]] = np.arange(len(keys))[::-1]
    e0 = flat_ends[first, 0].astype(np.float64)
    e1 = flat_ends[first, 1].astype(np.float64)
    v0 = flat_vals[first, 0]
    v1 = flat_vals[first, 1]
    denom = v1 - v0
    t = np.where(np.abs(denom) < 1e-12, 0.5, (iso - v0) / np.where(denom == 0, 1, denom))
    t = np.clip(t, 0.0, 1.0)
    pos_lattice = e0 + t[:, None] * (e1 - e0)
    verts = origin[None] + pos_lattice * spacing[None]

    faces = inv.reshape(-1, 3)
    # Drop degenerate faces (repeated vertices).
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return Mesh(verts, faces[good])


def largest_component(mesh: Mesh, near_origin: float | None = None) -> Mesh:
    """Keep the largest face-connected component (reference
    bundlesdf.py:747-760 trimesh_split + largest-component cleanup).

    ``near_origin``: if set, only components whose closest vertex is within
    this distance of the origin are eligible (reference
    benchmark_ho3d.py:106-115 floater rejection); falls back to the overall
    largest if none qualifies."""
    if len(mesh.faces) == 0:
        return mesh
    nv = len(mesh.vertices)
    f = mesh.faces
    rows = np.concatenate([f[:, 0], f[:, 1], f[:, 2]])
    cols = np.concatenate([f[:, 1], f[:, 2], f[:, 0]])
    adj = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(nv, nv))
    n, labels = _cc(adj, directed=False)
    if n <= 1:
        return mesh
    counts = np.bincount(labels, minlength=n)
    if near_origin is not None:
        dists = np.linalg.norm(mesh.vertices, axis=-1)
        min_d = np.full(n, np.inf)
        np.minimum.at(min_d, labels, dists)
        eligible = min_d <= near_origin
        if eligible.any():
            counts = np.where(eligible, counts, 0)
    keep_label = counts.argmax()
    keep_v = labels == keep_label
    remap = -np.ones(nv, dtype=np.int64)
    remap[keep_v] = np.arange(keep_v.sum())
    keep_f = keep_v[f].all(axis=1)
    new_faces = remap[f[keep_f]]
    vc = None if mesh.vertex_colors is None else mesh.vertex_colors[keep_v]
    return Mesh(mesh.vertices[keep_v], new_faces, vc)


def export_ply(mesh: Mesh, path: str):
    has_color = mesh.vertex_colors is not None
    with open(path, "wb") as fh:
        header = ["ply", "format ascii 1.0", f"element vertex {len(mesh.vertices)}",
                  "property float x", "property float y", "property float z"]
        if has_color:
            header += ["property uchar red", "property uchar green", "property uchar blue"]
        header += [f"element face {len(mesh.faces)}",
                   "property list uchar int vertex_indices", "end_header"]
        fh.write(("\n".join(header) + "\n").encode())
        if has_color:
            c = np.clip(mesh.vertex_colors, 0, 255).astype(np.int64)
            for v, col in zip(mesh.vertices, c):
                fh.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f} {col[0]} {col[1]} {col[2]}\n".encode())
        else:
            for v in mesh.vertices:
                fh.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n".encode())
        for f in mesh.faces:
            fh.write(f"3 {f[0]} {f[1]} {f[2]}\n".encode())


def export_obj(mesh: Mesh, path: str):
    with open(path, "w") as fh:
        if mesh.vertex_colors is not None:
            c = np.clip(mesh.vertex_colors, 0, 255) / 255.0
            for v, col in zip(mesh.vertices, c):
                fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f} {col[0]:.4f} {col[1]:.4f} {col[2]:.4f}\n")
        else:
            for v in mesh.vertices:
                fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in mesh.faces:
            fh.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")


def load_ply(path: str) -> Mesh:
    """Minimal PLY reader (ascii / binary_little_endian), vertices + optional
    faces + extra per-vertex properties (skipped).  Enough for the HO3D
    ``visible_mesh.ply`` GT point clouds (reference benchmark_ho3d.py:83)."""
    with open(path, "rb") as fh:
        fmt = None
        n_vert = n_face = 0
        vert_props: list[tuple[str, str]] = []  # (dtype, name)
        in_vertex = False
        while True:
            line = fh.readline().decode("ascii", "replace").strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element vertex"):
                n_vert = int(line.split()[-1])
                in_vertex = True
            elif line.startswith("element face"):
                n_face = int(line.split()[-1])
                in_vertex = False
            elif line.startswith("element"):
                in_vertex = False
            elif line.startswith("property") and in_vertex:
                _, dtype, name = line.split()[:3]
                vert_props.append((dtype, name))
            elif line == "end_header":
                break
        np_types = {
            "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
            "uint": "<u4", "uint32": "<u4",
        }
        if fmt == "ascii":
            rows = [fh.readline().split() for _ in range(n_vert)]
            names = [n for _, n in vert_props]
            arr = np.array(rows, dtype=np.float64)
            verts = arr[:, [names.index("x"), names.index("y"), names.index("z")]]
            faces = []
            for _ in range(n_face):
                parts = fh.readline().split()
                faces.append([int(parts[1]), int(parts[2]), int(parts[3])])
        elif fmt == "binary_little_endian":
            rec = np.dtype([(n, np_types[t]) for t, n in vert_props])
            data = np.frombuffer(fh.read(rec.itemsize * n_vert), dtype=rec)
            verts = np.stack([data["x"], data["y"], data["z"]], axis=-1).astype(np.float64)
            faces = []
            for _ in range(n_face):
                (cnt,) = np.frombuffer(fh.read(1), dtype=np.uint8)
                idx = np.frombuffer(fh.read(4 * cnt), dtype="<i4")
                faces.append(list(idx[:3]))
        else:  # pragma: no cover
            raise ValueError(f"unsupported ply format {fmt!r}")
    faces_arr = (np.asarray(faces, dtype=np.int64) if faces
                 else np.zeros((0, 3), dtype=np.int64))
    return Mesh(np.asarray(verts), faces_arr)


def load_obj(path: str) -> Mesh:
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) - 1 for p in line.split()[1:4]]
                faces.append(idx)
    return Mesh(np.array(verts), np.array(faces, dtype=np.int64))
