"""ctypes bindings for the native host library (native/nexus_native.cpp).

The reference's host acceleration layer is C++ (Nexus/src/Geometry/BVH/);
ours is too — this module loads `native/libnexus_native.so`, building it
with g++ on first use if missing (pybind11 isn't in the image; the C ABI
+ ctypes keeps the binding dependency-free). Everything has a NumPy
fallback (accel/bvh2.py, accel/links.py) selected automatically when the
toolchain is unavailable or NEXUS_NO_NATIVE is set; builder outputs are
REQUIRED to be identical to the fallbacks (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libnexus_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("NEXUS_NO_NATIVE"):
        return None
    try:
        if not _LIB_PATH.exists():
            src = _NATIVE_DIR / "nexus_native.cpp"
            if not src.exists():
                return None
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fPIC", "-shared",
                 "-std=c++17", "-o", str(_LIB_PATH), str(src)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
    except (OSError, subprocess.SubprocessError):
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.bvh2_build.restype = ctypes.c_int64
    lib.bvh2_build.argtypes = [f32p, f32p, f32p, ctypes.c_int64,
                               ctypes.c_int32, ctypes.c_int32,
                               f32p, f32p, i32p, i32p, i32p]
    lib.build_links.restype = None
    lib.build_links.argtypes = [f32p, f32p, i32p, i32p, ctypes.c_int64,
                                i32p, i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def bvh2_build(tmin, tmax, cent, leaf_size: int, force_leaf_one: bool):
    """Native binned-SAH build. Returns (bmin, bmax, left_first, count,
    tri_order) or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    tmin = np.ascontiguousarray(tmin, np.float32)
    tmax = np.ascontiguousarray(tmax, np.float32)
    cent = np.ascontiguousarray(cent, np.float32)
    n = tmin.shape[0]
    cap = max(2 * n, 16)
    bmin = np.empty((cap, 3), np.float32)
    bmax = np.empty((cap, 3), np.float32)
    left_first = np.zeros(cap, np.int32)
    count = np.zeros(cap, np.int32)
    order = np.empty(n, np.int32)
    m = lib.bvh2_build(tmin, tmax, cent, n, leaf_size,
                       1 if force_leaf_one else 0,
                       bmin, bmax, left_first, count, order)
    return (bmin[:m].copy(), bmax[:m].copy(), left_first[:m].copy(),
            count[:m].copy(), order)


def build_links(bmin, bmax, left_first, count):
    """Native per-octant skip links. Returns (hit, miss) each (8, M)
    int32, or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    left_first = np.ascontiguousarray(left_first, np.int32)
    count = np.ascontiguousarray(count, np.int32)
    m = left_first.shape[0]
    hit = np.empty(8 * m, np.int32)
    miss = np.empty(8 * m, np.int32)
    lib.build_links(bmin, bmax, left_first, count, m, hit, miss)
    return hit.reshape(8, m), miss.reshape(8, m)
