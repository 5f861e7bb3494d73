"""Remote feature-matching service (ZMQ REQ/REP).

The reference keeps a legacy C++-driven RPC path where feature matching is
served out-of-process over ZMQ (Lfnet remote keypoint server and
DeepOpticalFlow dense-correspondence server, FeatureManager.cpp:2080-2430;
protocol: multipart [sizes int32][raw u8 images] -> [dims][float32 corr
array]).  This is the TPU-native equivalent: it lets a matcher run in a
separate process (e.g. pinned to its own accelerator or host) while the
tracker stays lean.

Wire protocol (one REQ/REP round per batch):
  request:  frame 0 = int32 [B, H, W]; frames 1..2B = u8 grayscale images
            (pair i = frames 1+2i, 2+2i)
  reply:    frame 0 = int32 [B, K]; frame 1 = float32 (B, K, 5)
            [uA, vA, uB, vB, conf]; frame 2 = u8 (B, K) validity

Any engine with the ``predict(grayAs, grayBs) -> (corres, valid)`` contract
(LoftrMatcher, SiftMatcher, match_pairs_batched wrapper) can be served.
"""
from __future__ import annotations

import threading

import numpy as np


class MatchServer:
    """Serves a matcher engine over a ZMQ REP socket."""

    def __init__(self, engine, port: int = 0, host: str = "127.0.0.1",
                 pair_batch: int = 16):
        import zmq

        self.engine = engine
        # Batch-size bucketing for served JITTED engines: clients send
        # data-dependent batch sizes, and every distinct size would trigger
        # a fresh server-side XLA compile (~30-60 s on a tunneled TPU).
        # Pad to {1, pair_batch, next-pow2} exactly like find_corres does
        # (tracking/corres.py), then trim the reply (ADVICE r3 #2).  Host
        # engines (compiled=False) run unpadded.
        self.pair_batch = int(pair_batch)
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.REP)
        if port == 0:
            self.port = self._sock.bind_to_random_port(f"tcp://{host}")
        else:
            self._sock.bind(f"tcp://{host}:{port}")
            self.port = port
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _serve_one(self, timeout_ms: int = 200) -> bool:
        import zmq

        if not self._sock.poll(timeout_ms):
            return False
        frames = self._sock.recv_multipart()
        B, H, W = np.frombuffer(frames[0], np.int32)
        imgs = [np.frombuffer(f, np.uint8).reshape(H, W) for f in frames[1:]]
        a = np.stack(imgs[0::2])
        b = np.stack(imgs[1::2])
        n = len(a)
        if getattr(self.engine, "compiled", True) and n > 1:
            if n <= self.pair_batch:
                n_pad = self.pair_batch
            else:
                n_pad = 1 << max(0, (n - 1).bit_length())
            if n_pad > n:
                a = np.concatenate([a, np.repeat(a[:1], n_pad - n, axis=0)])
                b = np.concatenate([b, np.repeat(b[:1], n_pad - n, axis=0)])
        corres, valid = self.engine.predict(a, b)
        corres, valid = corres[:n], valid[:n]
        corres = np.ascontiguousarray(corres, np.float32)
        valid = np.ascontiguousarray(valid, np.uint8)
        hdr = np.array([corres.shape[0], corres.shape[1]], np.int32)
        self._sock.send_multipart([hdr.tobytes(), corres.tobytes(), valid.tobytes()])
        return True

    def serve_forever(self):
        while not self._stop.is_set():
            self._serve_one()

    def start(self):
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self._sock.close(linger=0)


class RemoteMatcher:
    """REQ-side client with the standard ``predict`` matcher contract."""

    # the server process owns any compile cost; the client never pads
    compiled = False

    def __init__(self, port: int, host: str = "127.0.0.1", timeout_ms: int = 30000):
        import zmq

        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.REQ)
        self._sock.setsockopt(zmq.RCVTIMEO, timeout_ms)
        self._sock.setsockopt(zmq.SNDTIMEO, timeout_ms)
        self._sock.connect(f"tcp://{host}:{port}")

    def predict(self, grayAs, grayBs):
        a = np.asarray(grayAs)
        b = np.asarray(grayBs)
        if a.dtype != np.uint8:
            mx = max(float(a.max()), 1e-6)
            a = (a / mx * 255 if mx <= 1.5 else a).astype(np.uint8)
            b = (b / mx * 255 if mx <= 1.5 else b).astype(np.uint8)
        B, H, W = a.shape
        hdr = np.array([B, H, W], np.int32)
        frames = [hdr.tobytes()]
        for i in range(B):
            frames.append(np.ascontiguousarray(a[i]).tobytes())
            frames.append(np.ascontiguousarray(b[i]).tobytes())
        self._sock.send_multipart(frames)
        rep = self._sock.recv_multipart()
        Bo, K = np.frombuffer(rep[0], np.int32)
        corres = np.frombuffer(rep[1], np.float32).reshape(Bo, K, 5)
        valid = np.frombuffer(rep[2], np.uint8).reshape(Bo, K).astype(bool)
        return corres, valid

    def close(self):
        self._sock.close(linger=0)
