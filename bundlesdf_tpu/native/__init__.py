"""ctypes bindings for the native host runtime (src/host_runtime.cpp).

Builds on demand with cmake+ninja into libbundlesdf_host.so next to this
file.  Every entry point has a pure-Python fallback elsewhere in the
package (io.readers, viz.renderer, utils.mesh), so `available()` gating is
enough — no hard dependency.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libbundlesdf_host.so")
_lib = None
_tried = False


def _build() -> bool:
    build_dir = os.path.join(_DIR, "build")
    os.makedirs(build_dir, exist_ok=True)
    try:
        subprocess.run(
            ["cmake", "-S", _DIR, "-B", build_dir, "-G", "Ninja"],
            check=True, capture_output=True, timeout=300,
        )
        subprocess.run(
            ["cmake", "--build", build_dir], check=True, capture_output=True,
            timeout=600,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        out = getattr(e, "stderr", b"") or b""
        logging.warning("native host runtime build failed: %s %s", e,
                        out.decode(errors="replace")[-2000:])
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.bsl_loader_create.restype = ctypes.c_void_p
    lib.bsl_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
    ]
    lib.bsl_loader_get.restype = ctypes.c_int
    lib.bsl_loader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.bsl_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.bsl_rasterize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.bsl_marching_tets.restype = ctypes.c_int
    lib.bsl_marching_tets.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


class FrameLoader:
    """Threaded prefetching RGBD frame loader (C++)."""

    def __init__(self, color_paths, depth_paths, mask_paths, H, W,
                 depth_scale=1e-3, n_threads=4, prefetch=8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native host runtime unavailable")
        self._lib = lib
        self.H, self.W = int(H), int(W)
        n = len(color_paths)

        def arr(paths):
            a = (ctypes.c_char_p * n)()
            a[:] = [p.encode() for p in paths]
            return a

        self._handle = lib.bsl_loader_create(
            arr(color_paths), arr(depth_paths),
            arr(mask_paths) if mask_paths else None,
            n, self.H, self.W, ctypes.c_float(depth_scale), n_threads,
            prefetch,
        )
        self.n = n

    def get(self, idx: int):
        rgb = np.empty((self.H, self.W, 3), np.uint8)
        depth = np.empty((self.H, self.W), np.float32)
        mask = np.empty((self.H, self.W), np.uint8)
        rc = self._lib.bsl_loader_get(
            self._handle, int(idx),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        if rc != 0:
            raise IndexError(f"frame {idx} out of range")
        return rgb, depth, mask

    def close(self):
        if self._handle:
            self._lib.bsl_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def rasterize(verts, faces, K, ob_in_cam, H, W, znear=0.001, zfar=100.0):
    """Z-buffer rasterize a mesh; returns (depth (H,W), face_id (H,W) int32
    -1=empty, bary (H,W,3))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native host runtime unavailable")
    verts = _as_f32(verts)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    K = _as_f32(K)
    T = _as_f32(ob_in_cam)
    depth = np.zeros((H, W), np.float32)
    face = np.zeros((H, W), np.int32)
    bary = np.zeros((H, W, 3), np.float32)
    lib.bsl_rasterize(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
        K.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(H), int(W), ctypes.c_float(znear), ctypes.c_float(zfar),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        face.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bary.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return depth, face, bary


def marching_tets(field, iso=0.0):
    """Iso-surface a dense (nx, ny, nz) scalar field.  Returns (n_tris, 3,
    3) float32 triangle soup in grid-index coordinates."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native host runtime unavailable")
    field = _as_f32(field)
    nx, ny, nz = field.shape
    cap = 1 << 18
    while True:
        out = np.empty((cap, 9), np.float32)
        n = lib.bsl_marching_tets(
            field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nx, ny, nz, ctypes.c_float(iso),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        )
        if n <= cap:
            return out[:n].reshape(n, 3, 3)
        cap = int(n * 1.2) + 1
