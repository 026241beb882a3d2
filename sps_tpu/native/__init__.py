"""ctypes bindings for the native data plane (csrc/sps_io.cpp).

Auto-builds csrc/libsps_io.so on first import if the toolchain is present;
all entry points have numpy fallbacks so the framework remains usable
without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "csrc")
_SO = os.path.join(_CSRC, "libsps_io.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.sps_npy_load_f32.restype = ctypes.POINTER(ctypes.c_float)
    lib.sps_npy_load_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.sps_free.argtypes = [ctypes.c_void_p]
    lib.sps_replayer_create.restype = ctypes.c_void_p
    lib.sps_replayer_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.sps_replayer_next.restype = ctypes.c_int64
    lib.sps_replayer_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.sps_replayer_destroy.argtypes = [ctypes.c_void_p]
    lib.sps_radius_join.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_npy_f32(path: str) -> np.ndarray:
    """Native .npy float array loader; falls back to np.load."""
    lib = _load()
    if lib is None:
        return np.load(path).astype(np.float32)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    ptr = lib.sps_npy_load_f32(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if not ptr:
        return np.load(path).astype(np.float32)
    n = rows.value * cols.value
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).reshape(rows.value, cols.value).copy()
    lib.sps_free(ptr)
    return arr


class Replayer:
    """Threaded scan prefetcher: yields (padded (cap, cols) float32, rows).

    Host-side stand-in for the reference's rosbag play + scans_pub
    publishers (SURVEY.md §3.3-3.4): scan i+1 loads from disk on a worker
    thread while scan i is on the device."""

    def __init__(self, paths: list[str], cap_rows: int, cols: int, depth: int = 4):
        self.paths = list(paths)
        self.cap_rows = cap_rows
        self.cols = cols
        self._lib = _load()
        self._h = None
        self._idx = 0
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._h = self._lib.sps_replayer_create(
                arr, len(self.paths), cap_rows, cols, depth
            )

    def __iter__(self):
        return self

    def __next__(self):
        if self._h is not None:
            out = np.zeros((self.cap_rows, self.cols), np.float32)
            rows = self._lib.sps_replayer_next(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            if rows == -1:
                raise StopIteration
            if rows == -2:
                raise IOError("replayer failed to load a scan")
            return out, int(rows)
        # numpy fallback
        if self._idx >= len(self.paths):
            raise StopIteration
        a = np.load(self.paths[self._idx]).astype(np.float32)
        self._idx += 1
        out = np.zeros((self.cap_rows, self.cols), np.float32)
        r = min(len(a), self.cap_rows)
        out[:r, : a.shape[1]] = a[:r, : self.cols]
        return out, r

    def close(self):
        if self._h is not None:
            self._lib.sps_replayer_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def radius_join_cpu(scan: np.ndarray, query: np.ndarray, r: float) -> np.ndarray:
    """mask[j] = any scan point within r of query[j]. Native hash grid;
    numpy brute-force fallback for tiny inputs."""
    scan = np.ascontiguousarray(scan[:, :3], np.float32)
    query = np.ascontiguousarray(query[:, :3], np.float32)
    lib = _load()
    if lib is None:
        d2 = ((query[:, None, :] - scan[None, :, :]) ** 2).sum(-1)
        return (d2.min(axis=1) <= r * r) if len(scan) else np.zeros(len(query), bool)
    mask = np.zeros(len(query), np.uint8)
    lib.sps_radius_join(
        scan.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(scan),
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(query),
        ctypes.c_float(r),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.astype(bool)
