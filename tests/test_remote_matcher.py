"""Remote matcher service round-trip (reference ZMQ feature servers,
FeatureManager.cpp:2080-2430)."""
import numpy as np

from bundlesdf_tpu.io.remote_matcher import MatchServer, RemoteMatcher
from bundlesdf_tpu.models.matcher import SiftMatcher


def test_remote_matcher_roundtrip():
    rng = np.random.default_rng(0)
    img = np.zeros((96, 96), np.uint8)
    for _ in range(30):
        y, x = rng.integers(8, 88, 2)
        img[y-3:y+3, x-3:x+3] = rng.integers(80, 255)
    import cv2
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    batchA = np.stack([img, np.roll(img, 5, axis=1)])
    batchB = np.stack([img, img])

    engine = SiftMatcher(max_matches=64)
    server = MatchServer(engine, port=0).start()
    try:
        client = RemoteMatcher(server.port)
        corres, valid = client.predict(batchA, batchB)
        ref_c, ref_v = engine.predict(batchA, batchB)
        np.testing.assert_allclose(corres, ref_c, atol=1e-5)
        np.testing.assert_array_equal(valid, ref_v)
        assert valid[0].sum() >= 5
        client.close()
    finally:
        server.stop()
