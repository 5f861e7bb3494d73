import numpy as np
from scipy.spatial.transform import Rotation

from bundlesdf_tpu.utils import metrics


def test_add_err_zero_for_identical():
    pts = np.random.randn(100, 3)
    T = np.eye(4)
    assert metrics.add_err(T, T, pts) == 0.0
    assert metrics.adi_err(T, T, pts) < 1e-12


def test_add_err_translation():
    pts = np.random.randn(100, 3)
    T1 = np.eye(4)
    T2 = np.eye(4)
    T2[:3, 3] = [0.01, 0, 0]
    assert abs(metrics.add_err(T1, T2, pts) - 0.01) < 1e-9


def test_adi_less_than_add_for_symmetric():
    # Rotating a circle of points around its axis: ADD large, ADD-S ~ 0
    theta = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    pts = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)], -1)
    T1 = np.eye(4)
    T2 = np.eye(4)
    T2[:3, :3] = Rotation.from_rotvec([0, 0, np.pi / 7]).as_matrix()
    add = metrics.add_err(T1, T2, pts)
    adi = metrics.adi_err(T1, T2, pts)
    assert add > 0.1
    assert adi < 0.05


def test_compute_auc_perfect():
    errs = np.zeros(10)
    assert abs(metrics.compute_auc(errs, 0.1) - 1.0) < 1e-2


def test_compute_auc_all_over_threshold():
    errs = np.full(10, 1.0)
    assert metrics.compute_auc(errs, 0.1) == 0.0


def test_compute_auc_half():
    # half the errors tiny, half over threshold -> auc ~ 0.5
    errs = np.concatenate([np.full(50, 1e-6), np.full(50, 1.0)])
    auc = metrics.compute_auc(errs, 0.1)
    assert 0.45 < auc < 0.55


def test_chamfer_identical_zero():
    pts = np.random.randn(200, 3)
    assert metrics.chamfer_distance(pts, pts) < 1e-12


def test_align_first_frame():
    rng = np.random.default_rng(0)
    gts = np.stack([np.eye(4)] * 5)
    for i in range(5):
        gts[i, :3, 3] = rng.normal(size=3)
    # Predictions differ by a constant offset transform
    off = np.eye(4)
    off[:3, 3] = [1.0, 2.0, 3.0]
    preds = np.einsum("nij,jk->nik", gts, np.linalg.inv(off))
    aligned = metrics.align_to_first_frame(preds, gts)
    np.testing.assert_allclose(aligned, gts, atol=1e-10)
