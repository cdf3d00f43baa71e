"""ctypes bindings for the native data plane (`native/src/hgs_io.cpp`).

The reference loads+resizes every training image through PIL in Python
threads (`utils/camera_utils.py:69-90`); here the decode (libjpeg /
libpng), the antialiased resize, the float normalization, and the
prefetch pool are C++ — ctypes releases the GIL for the call's duration
so submissions overlap fully. The module degrades gracefully: if the
shared library is missing it tries one quiet `make` (g++ is in the
image); if that fails, `available()` is False and callers fall back to
PIL.

API:
  available() -> bool
  image_info(path) -> (w, h, channels)
  load_image_rgba(path, tw, th) -> float32 ndarray (th, tw, 4) in [0,1]
  ImagePool(n_threads).load_many([(path, tw, th), ...]) -> list[ndarray]
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libhgs_io.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _try_build() -> bool:
    global _build_attempted
    if _build_attempted:
        return os.path.exists(_SO_PATH)
    _build_attempted = True
    if not os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        return False
    return os.path.exists(_SO_PATH)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) and not _try_build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.hgs_image_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.hgs_image_info.restype = ctypes.c_int
        lib.hgs_load_resize_rgba.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.hgs_load_resize_rgba.restype = ctypes.c_int
        lib.hgs_pool_create.argtypes = [ctypes.c_int]
        lib.hgs_pool_create.restype = ctypes.c_void_p
        lib.hgs_pool_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.hgs_pool_submit.restype = ctypes.c_int
        lib.hgs_pool_wait.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.hgs_pool_wait.restype = ctypes.c_int
        lib.hgs_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.hgs_pool_destroy.restype = None
        lib.hgs_colmap_points3d_count.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong)]
        lib.hgs_colmap_points3d_count.restype = ctypes.c_int
        lib.hgs_colmap_points3d_read.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_longlong)]
        lib.hgs_colmap_points3d_read.restype = ctypes.c_int
        _lib = lib
        return _lib


NATIVE_FORMATS = (".jpg", ".jpeg", ".png", ".JPG", ".JPEG", ".PNG")


def available() -> bool:
    return _load() is not None


def image_info(path: str) -> Tuple[int, int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native hgs_io not available")
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.hgs_image_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(c))
    if rc != 0:
        raise IOError(f"hgs_image_info({path}) failed: {rc}")
    return w.value, h.value, c.value


def load_image_rgba(path: str, tw: int, th: int) -> np.ndarray:
    """Decode + antialiased-resize to (th, tw, 4) float32 RGBA in [0,1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native hgs_io not available")
    out = np.empty((th, tw, 4), dtype=np.float32)
    rc = lib.hgs_load_resize_rgba(
        path.encode(), tw, th,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"hgs_load_resize_rgba({path}) failed: {rc}")
    return out


def read_colmap_points3d(path: str):
    """Parse COLMAP points3D.bin natively: one fread + pointer walk vs
    the Python per-point struct loop. Returns (ids int64 (N,),
    xyz float64 (N,3), rgb uint8 (N,3), err float64 (N,))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native hgs_io not available")
    n = ctypes.c_longlong()
    rc = lib.hgs_colmap_points3d_count(path.encode(), ctypes.byref(n))
    if rc != 0:
        raise IOError(f"points3d count({path}) failed: {rc}")
    n = n.value
    ids = np.empty(n, dtype=np.int64)
    xyz = np.empty((n, 3), dtype=np.float64)
    rgb = np.empty((n, 3), dtype=np.uint8)
    err = np.empty(n, dtype=np.float64)
    track_total = ctypes.c_longlong()
    rc = lib.hgs_colmap_points3d_read(
        path.encode(), n,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(track_total))
    if rc != 0:
        raise IOError(f"points3d read({path}) failed: {rc}")
    return ids, xyz, rgb, err


class ImagePool:
    """Native prefetch pool: submits decode+resize jobs to C++ worker
    threads, buffers owned by numpy (no copies back)."""

    def __init__(self, n_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native hgs_io not available")
        self._lib = lib
        self._pool = lib.hgs_pool_create(n_threads)
        self._bufs: List[np.ndarray] = []

    def submit(self, path: str, tw: int, th: int) -> int:
        out = np.empty((th, tw, 4), dtype=np.float32)
        ticket = self._lib.hgs_pool_submit(
            self._pool, path.encode(), tw, th,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        assert ticket == len(self._bufs)
        self._bufs.append(out)
        return ticket

    def get(self, ticket: int) -> np.ndarray:
        rc = self._lib.hgs_pool_wait(self._pool, ticket)
        if rc != 0:
            raise IOError(f"native image load failed (ticket {ticket}): {rc}")
        return self._bufs[ticket]

    def load_many(self, jobs: Sequence[Tuple[str, int, int]]
                  ) -> List[np.ndarray]:
        tickets = [self.submit(*j) for j in jobs]
        return [self.get(t) for t in tickets]

    def close(self):
        if self._pool is not None:
            self._lib.hgs_pool_destroy(self._pool)
            self._pool = None
            self._bufs = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
