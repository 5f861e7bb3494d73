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
