"""ctypes bindings for the native host builders (builders.cpp).

The library is compiled on first use with the system g++ (no pybind11 in
this image; plain C ABI + ctypes keeps the binding dependency-free). Every
entry point has a pure-numpy fallback in accel/ — `available()` gates use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "builders.cpp")
_LIB = os.path.join(_DIR, "libbuilders.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not _compile():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.lupin_build_bvh.restype = ctypes.c_int
        lib.lupin_build_bvh.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, i32p, i32p, i32p, ctypes.POINTER(ctypes.c_int),
        ]
        lib.lupin_build_alias_table.restype = ctypes.c_int
        lib.lupin_build_alias_table.argtypes = [
            f32p, ctypes.c_longlong, f32p, f32p, u32p,
        ]
        lib.lupin_decode_rgbe.restype = ctypes.c_int
        lib.lupin_decode_rgbe.argtypes = [
            u8p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int, u8p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(tri_lo, tri_hi, max_leaf_size=4, max_depth=25):
    """Native binned-SAH BVH; returns the same tuple shape as
    accel.bvh.build_bvh (aabb_min, aabb_max, first, count, order, depth)."""

    lib = _load()
    assert lib is not None
    tri_lo = np.ascontiguousarray(tri_lo, np.float32)
    tri_hi = np.ascontiguousarray(tri_hi, np.float32)
    T = tri_lo.shape[0]
    cap = max(2 * T + 1, 1)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_first = np.empty(cap, np.int32)
    node_count = np.empty(cap, np.int32)
    order = np.empty(max(T, 1), np.int32)
    depth = ctypes.c_int(0)
    n = lib.lupin_build_bvh(
        tri_lo, tri_hi, T, max_leaf_size, max_depth,
        node_min, node_max, node_first, node_count, order,
        ctypes.byref(depth),
    )
    return (
        node_min[:n].copy(),
        node_max[:n].copy(),
        node_first[:n].copy(),
        node_count[:n].copy(),
        order[:T].copy(),
        int(depth.value),
    )


def build_alias_table_native(weights):
    lib = _load()
    assert lib is not None
    w = np.ascontiguousarray(weights, np.float32).ravel()
    n = w.size
    prob = np.zeros(n, np.float32)
    thresh = np.zeros(n, np.float32)
    alias = np.zeros(n, np.uint32)
    rc = lib.lupin_build_alias_table(w, n, prob, thresh, alias)
    if rc != 0:
        return (
            np.zeros(0, np.float32),
            np.zeros(0, np.float32),
            np.zeros(0, np.uint32),
        )
    return prob, thresh, alias


def decode_rgbe_native(body: bytes, width: int, height: int):
    """Returns (H, W, 4) uint8 RGBE or None on failure."""

    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(body, np.uint8)
    out = np.empty((height, width, 4), np.uint8)
    rc = lib.lupin_decode_rgbe(
        np.ascontiguousarray(buf), buf.size, width, height,
        out.reshape(-1),
    )
    if rc != 0:
        return None
    return out
