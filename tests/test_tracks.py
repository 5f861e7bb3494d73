"""FeatureTracks (map-point) subsystem."""
import numpy as np

from bundlesdf_tpu.tracking.corres import FeatureTracks


def test_tracks_union_and_covisibility():
    t = FeatureTracks(quant=2)
    uvA = np.array([[10, 10], [20, 20], [30, 30]])
    uvB = np.array([[12, 10], [22, 20], [32, 30]])
    inl = np.array([True, True, False])
    t.add_matches(0, 1, uvA, uvB, inl)
    assert t.n_covisible(0, 1) == 2
    assert t.n_covisible(0, 2) == 0
    # frame 2 matches frame 1 at the same keypoints -> tracks link 0-1-2
    t.add_matches(2, 1, uvA, uvB, np.array([True, False, False]))
    # frame2's kp (10,10) joined frame1's (12,10) track, which includes frame0
    assert t.n_covisible(0, 2) >= 1


def test_tracks_propagate():
    t = FeatureTracks(quant=2)
    # 0 <-> 1 and 2 <-> 1 share frame-1 keypoints -> propagate 0 <-> 2
    t.add_matches(0, 1, np.array([[10, 10]]), np.array([[50, 50]]), np.array([True]))
    t.add_matches(2, 1, np.array([[70, 70]]), np.array([[50, 50]]), np.array([True]))
    uvA, uvB = t.propagate(0, 2)
    assert len(uvA) == 1
    np.testing.assert_allclose(uvA[0], [10, 10])
    np.testing.assert_allclose(uvB[0], [70, 70])


def test_tracks_forget_frame():
    t = FeatureTracks(quant=2)
    t.add_matches(0, 1, np.array([[10, 10]]), np.array([[50, 50]]), np.array([True]))
    t.forget_frame(1)
    assert t.n_covisible(0, 1) == 0


def test_tracks_memory_bounded_over_long_video():
    """forget_frame must compact the union-find: over a long sliding-window
    video the parent table stays O(live keys), not O(total history)."""
    import numpy as np
    from bundlesdf_tpu.tracking.corres import FeatureTracks

    tr = FeatureTracks()
    rng = np.random.default_rng(0)
    window = 5
    for f in range(300):
        uvA = rng.uniform(0, 400, (32, 2))
        uvB = uvA + rng.uniform(-1, 1, (32, 2))
        inl = np.ones(32, bool)
        if f > 0:
            tr.add_matches(f, f - 1, uvA, uvB, inl)
        if f >= window:
            tr.forget_frame(f - window)
    n_live = sum(len(ks) for ks in tr._frame_keys.values())
    assert len(tr._parent) <= max(1024, 2 * n_live) + 64 * 2  # one frame's slack
    # connectivity among live frames survives compaction
    assert tr.n_covisible(299, 298) > 0
