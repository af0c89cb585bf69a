"""Native (C++) runtime components, loaded via ctypes.

The reference implements its accel builder, loaders, and runtime in C++
(kdtree.h, obj.cpp, ...); this package holds the TPU rebuild's native
pieces. Libraries compile on first use with g++ into `_build/` (no
pybind11 in this environment — plain C ABI + ctypes, zero dependencies)
and every entry point has a pure-Python fallback, so the framework works
without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "_build")
_LOCK = threading.Lock()
_LIBS = {}


def _compile(name: str, src: str) -> str:
    """g++ -O3 -shared; returns the .so path (cached by mtime)."""
    os.makedirs(_BUILD, exist_ok=True)
    so = os.path.join(_BUILD, f"lib{name}.so")
    cpp = os.path.join(_DIR, src)
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(cpp):
        return so
    tmp = so + ".tmp"
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           cpp, "-o", tmp]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so)
    return so


def _load(name: str, src: str):
    with _LOCK:
        if name not in _LIBS:
            _LIBS[name] = ctypes.CDLL(_compile(name, src))
        return _LIBS[name]


# ---------------------------------------------------------------------------
# BVH builder (bvh_builder.cpp)
# ---------------------------------------------------------------------------

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def build_bvh_native(bb_min: np.ndarray, bb_max: np.ndarray):
    """Binned-SAH BVH2 build in C++. Returns the same tuple layout as
    scene.bvh.build_bvh or raises on toolchain failure (caller falls back).
    """
    lib = _load("mts_bvh", "bvh_builder.cpp")
    fn = lib.mts_build_bvh
    fn.restype = ctypes.c_int64
    fn.argtypes = [_f32p, _f32p, ctypes.c_int64, _f32p, _f32p,
                   _i32p, _i32p, _i32p, _i32p]
    P = bb_min.shape[0]
    cap = max(2 * P, 2)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    leaf_start = np.empty(cap, np.int32)
    leaf_count = np.empty(cap, np.int32)
    miss = np.empty(cap, np.int32)
    prim_order = np.empty(P, np.int32)
    n = fn(np.ascontiguousarray(bb_min, np.float32),
           np.ascontiguousarray(bb_max, np.float32),
           P, node_min, node_max, leaf_start, leaf_count, miss, prim_order)
    return (node_min[:n].copy(), node_max[:n].copy(), leaf_start[:n].copy(),
            leaf_count[:n].copy(), miss[:n].copy(), prim_order)


def available() -> bool:
    """True if the native toolchain works on this machine."""
    try:
        _load("mts_bvh", "bvh_builder.cpp")
        return True
    except Exception:
        return False
