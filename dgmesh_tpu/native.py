"""ctypes bindings for the native host library (csrc/dgmesh_native.cpp).

Builds on first use with g++ (cached under csrc/build/); every entry point
has a pure-Python fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "csrc", "dgmesh_native.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "..", "csrc", "build",
                    "libdgmesh_native.so")


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_OUT), exist_ok=True)
    src = os.path.abspath(_SRC)
    out = os.path.abspath(_OUT)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build()
        if path:
            lib = ctypes.CDLL(path)
            c_ll, c_p = ctypes.c_longlong, ctypes.c_char_p
            lib.colmap_points3d_count.restype = c_ll
            lib.colmap_points3d_count.argtypes = [c_p]
            lib.colmap_points3d_read.restype = c_ll
            lib.colmap_images_count.restype = c_ll
            lib.colmap_images_count.argtypes = [c_p]
            lib.colmap_images_read.restype = c_ll
            lib.ply_read_f32.restype = c_ll
            _LIB = lib
    return _LIB


def colmap_points3d(path: str):
    """Fast path for COLMAP points3D.bin; returns (xyz f64 (N,3), rgb u8 (N,3))
    or None to signal Python fallback."""
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return None
    n = lib.colmap_points3d_count(path.encode())
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n, np.float64)
    got = lib.colmap_points3d_read(
        path.encode(),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got != n:
        return None
    return xyz, rgb


def chamfer_cpu(a: np.ndarray, b: np.ndarray, n_threads: int = 0):
    """Exact bidirectional chamfer on CPU (squared), native or numpy."""
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    lib = get_lib()
    if lib is not None:
        d_ab = np.empty(len(a), np.float32)
        d_ba = np.empty(len(b), np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.chamfer_nn(a.ctypes.data_as(fp), len(a), b.ctypes.data_as(fp),
                       len(b), d_ab.ctypes.data_as(fp), n_threads)
        lib.chamfer_nn(b.ctypes.data_as(fp), len(b), a.ctypes.data_as(fp),
                       len(a), d_ba.ctypes.data_as(fp), n_threads)
        return float(d_ab.mean() + d_ba.mean()), d_ab, d_ba
    # numpy fallback (chunked)
    def nn(x, y):
        out = np.empty(len(x), np.float32)
        for i in range(0, len(x), 512):
            xs = x[i:i + 512]
            d = ((xs[:, None, :] - y[None, :, :]) ** 2).sum(-1)
            out[i:i + 512] = d.min(1)
        return out
    d_ab, d_ba = nn(a, b), nn(b, a)
    return float(d_ab.mean() + d_ba.mean()), d_ab, d_ba
