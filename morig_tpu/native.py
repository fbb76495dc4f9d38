"""ctypes bindings for the C++ preprocessing accelerators (native/).

Builds libmorig_native.so on first use (g++ -O3) and falls back to the pure
Python implementations when the toolchain or the build is unavailable, so the
framework stays importable everywhere.  See native/morig_native.cpp for what
each kernel replaces in the reference.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "morig_native.cpp")
_LIB = os.path.join(_REPO, "native", "libmorig_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.geodesic_knn_dijkstra.argtypes = [
        f32, f32, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float, f32]
    lib.solid_fill.argtypes = [u8, ctypes.c_int]
    lib.one_ring_edges.argtypes = [i32, ctypes.c_int, i32, ctypes.c_int]
    lib.one_ring_edges.restype = ctypes.c_int
    lib.voxel_bfs.argtypes = [u8, ctypes.c_int, i32, ctypes.c_int, i32]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# wrappers (None return -> caller should use the Python fallback)
# ---------------------------------------------------------------------------

def geodesic_all_pairs(pts: np.ndarray, normals: np.ndarray, knn: int = 5,
                       cos_min: float = -0.5, inf_offset: float = 8.0) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    normals = np.ascontiguousarray(normals, np.float32)
    n = len(pts)
    out = np.zeros((n, n), np.float32)
    lib.geodesic_knn_dijkstra(pts, normals, n, knn, cos_min, inf_offset, out)
    return out


def solid_fill(shell: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    grid = np.ascontiguousarray(shell.astype(np.uint8))
    lib.solid_fill(grid, grid.shape[0])
    return grid.astype(bool)


def one_ring_edges(faces: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    cap = len(faces) * 3
    out = np.zeros((cap, 2), np.int32)
    n = lib.one_ring_edges(faces, len(faces), out, cap)
    if n < 0:
        return None
    return out[:n].copy()


def voxel_bfs(solid: np.ndarray, seeds: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    grid = np.ascontiguousarray(solid.astype(np.uint8))
    seeds = np.ascontiguousarray(seeds, np.int32)
    d = grid.shape[0]
    out = np.zeros(d * d * d, np.int32)
    lib.voxel_bfs(grid, d, seeds, len(seeds), out)
    return out.reshape(d, d, d)
