import numpy as np

from bundlesdf_tpu.utils import mesh as mesh_utils
from bundlesdf_tpu.utils.metrics import chamfer_distance


def sphere_sdf_grid(R=48, radius=0.5):
    lin = np.linspace(-1, 1, R)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - radius


def test_marching_tets_sphere():
    sdf = sphere_sdf_grid()
    m = mesh_utils.marching_tetrahedra(sdf, iso=0.0)
    assert len(m.vertices) > 500
    assert len(m.faces) > 1000
    r = np.linalg.norm(m.vertices, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.01)
    assert r.std() < 0.01


def test_marching_tets_empty():
    sdf = np.full((16, 16, 16), 1.0)
    m = mesh_utils.marching_tetrahedra(sdf, iso=0.0)
    assert len(m.faces) == 0


def test_marching_tets_watertight_sphere():
    # Every edge of a closed surface should be shared by exactly 2 faces.
    sdf = sphere_sdf_grid(R=32)
    m = mesh_utils.marching_tetrahedra(sdf, iso=0.0)
    edges = np.concatenate(
        [m.faces[:, [0, 1]], m.faces[:, [1, 2]], m.faces[:, [2, 0]]]
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_largest_component():
    sdf1 = sphere_sdf_grid(R=48, radius=0.3)
    # add a smaller separate sphere at a corner
    lin = np.linspace(-1, 1, 48)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    sdf2 = np.sqrt((X - 0.7) ** 2 + (Y - 0.7) ** 2 + (Z - 0.7) ** 2) - 0.1
    m = mesh_utils.marching_tetrahedra(np.minimum(sdf1, sdf2), iso=0.0)
    big = mesh_utils.largest_component(m)
    assert len(big.faces) < len(m.faces)
    r = np.linalg.norm(big.vertices, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.3, atol=0.02)


def test_sample_surface_chamfer():
    sdf = sphere_sdf_grid()
    m = mesh_utils.marching_tetrahedra(sdf, iso=0.0)
    pts = m.sample_surface(5000)
    r = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.01)
    # chamfer between two independent samplings is small
    pts2 = m.sample_surface(5000, seed=1)
    assert chamfer_distance(pts, pts2) < 0.02


def test_export_roundtrip(tmp_path):
    sdf = sphere_sdf_grid(R=24)
    m = mesh_utils.marching_tetrahedra(sdf, iso=0.0)
    p = str(tmp_path / "m.obj")
    m.export(p)
    m2 = mesh_utils.load_obj(p)
    assert len(m2.vertices) == len(m.vertices)
    assert len(m2.faces) == len(m.faces)
    m.export(str(tmp_path / "m.ply"))


def test_mask_culling():
    sdf = sphere_sdf_grid(R=32)
    mask = np.zeros_like(sdf, dtype=bool)
    mask[:16] = True  # only extract half the domain
    m = mesh_utils.marching_tetrahedra(sdf, iso=0.0, mask=mask)
    assert len(m.vertices) > 0
    assert m.vertices[:, 0].max() <= 0.01


def _uv_sphere(radius=0.5, n_lat=24, n_lon=32, z_min=-1.0):
    """Lat-long sphere mesh; z_min crops to a partial shell (z >= z_min*r)."""
    lats = np.linspace(np.arcsin(np.clip(z_min, -1, 1)), np.pi / 2, n_lat)
    lons = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    verts = []
    for la in lats:
        for lo in lons:
            verts.append([radius * np.cos(la) * np.cos(lo),
                          radius * np.cos(la) * np.sin(lo),
                          radius * np.sin(la)])
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    return mesh_utils.Mesh(np.asarray(verts), np.asarray(faces, np.int64))


def test_load_ply_roundtrip(tmp_path):
    m = _uv_sphere(n_lat=6, n_lon=8)
    p = str(tmp_path / "m.ply")
    mesh_utils.export_ply(m, p)
    m2 = mesh_utils.load_ply(p)
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-5)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_visible_shell_chamfer_half_sphere():
    """The chamfer target matters: a perfect HALF-sphere reconstruction
    must score near-zero against the visible half-shell but poorly against
    the full GT model (the reference evaluates vs visible_mesh.ply,
    benchmark_ho3d.py:83-128 — regression for the dead-vis_gt bug)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from benchmark_ho3d import mesh_chamfer_vs_visible

    pred = _uv_sphere(z_min=0.0)  # top half only (what was observed)
    visible_pts = _uv_sphere(z_min=0.0, n_lat=48, n_lon=64).sample_surface(50000)
    full_pts = _uv_sphere(z_min=-1.0, n_lat=48, n_lon=64).sample_surface(50000)

    I = np.eye(4)
    cd_vis = mesh_chamfer_vs_visible(pred, visible_pts, I, I)
    cd_full = mesh_chamfer_vs_visible(pred, full_pts, I, I)
    assert cd_vis < 0.005, cd_vis          # sub-5 mm vs the right target
    assert cd_full > 3 * cd_vis, (cd_full, cd_vis)  # full model inflates it


def test_largest_component_near_origin():
    """near_origin gating keeps the on-object component even when a far
    floater is bigger (reference benchmark_ho3d.py:106-115)."""
    small = _uv_sphere(radius=0.05, n_lat=8, n_lon=10)     # near origin
    big = _uv_sphere(radius=0.05, n_lat=16, n_lon=24)      # bigger, far away
    big = mesh_utils.Mesh(big.vertices + 5.0, big.faces)
    merged = mesh_utils.Mesh(
        np.concatenate([small.vertices, big.vertices]),
        np.concatenate([small.faces, big.faces + len(small.vertices)]),
    )
    kept_plain = mesh_utils.largest_component(merged)
    assert np.linalg.norm(kept_plain.vertices.mean(0)) > 1  # floater wins
    kept = mesh_utils.largest_component(merged, near_origin=0.1)
    assert np.linalg.norm(kept.vertices.mean(0)) < 0.1
