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
    """g++ -O3 -shared; returns the .so path (cached by mtime).

    Concurrency-safe across PROCESSES: the build holds an fcntl lock and
    compiles into a per-PID temp file, installing it with an atomic
    rename (readers that already dlopen'd the old inode keep a valid
    mapping). Two pytest processes compiling into one shared tmp path
    used to interleave g++ output and install a corrupt .so."""
    os.makedirs(_BUILD, exist_ok=True)
    so = os.path.join(_BUILD, f"lib{name}.so")
    cpp = os.path.join(_DIR, src)

    def fresh():
        return (os.path.exists(so)
                and os.path.getmtime(so) >= os.path.getmtime(cpp))

    if fresh():
        return so
    import fcntl
    with open(so + ".lock", "w") as lockf:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        try:
            if fresh():  # another process built it while we waited
                return so
            tmp = f"{so}.{os.getpid()}.tmp"
            cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                   "-fPIC", cpp, "-o", tmp]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp, so)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        finally:
            fcntl.flock(lockf, fcntl.LOCK_UN)
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


# ---------------------------------------------------------------------------
# OBJ parser (obj_parser.cpp)
# ---------------------------------------------------------------------------

def parse_obj_native(path: str, flip_tex_coords: bool = True):
    """Fast C++ OBJ parse. Returns (vertices (V,3) f32, faces (F,3) i32,
    normals (V,3) f32 or None, uvs (V,2) f32 or None) with the same
    split-vertex semantics as scene.mesh_io's Python parser. Raises on
    toolchain or parse failure (caller falls back)."""
    lib = _load("mts_obj", "obj_parser.cpp")
    fn = lib.mts_parse_obj
    fn.restype = ctypes.c_int64
    c_fpp = ctypes.POINTER(ctypes.c_float)
    c_ipp = ctypes.POINTER(ctypes.c_int32)
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int,
                   ctypes.POINTER(c_fpp), ctypes.POINTER(ctypes.c_int64),
                   ctypes.POINTER(c_ipp), ctypes.POINTER(ctypes.c_int64),
                   ctypes.POINTER(c_fpp), ctypes.POINTER(ctypes.c_int32),
                   ctypes.POINTER(c_fpp), ctypes.POINTER(ctypes.c_int32)]
    free_fn = lib.mts_free
    free_fn.argtypes = [ctypes.c_void_p]

    pv = c_fpp(); pf = c_ipp(); pn = c_fpp(); puv = c_fpp()
    nv = ctypes.c_int64(); nf = ctypes.c_int64()
    hn = ctypes.c_int32(); huv = ctypes.c_int32()
    rc = fn(path.encode(), 1 if flip_tex_coords else 0,
            ctypes.byref(pv), ctypes.byref(nv),
            ctypes.byref(pf), ctypes.byref(nf),
            ctypes.byref(pn), ctypes.byref(hn),
            ctypes.byref(puv), ctypes.byref(huv))
    if rc != 0:
        raise RuntimeError(f"mts_parse_obj failed with code {rc}")
    try:
        V = int(nv.value)
        F = int(nf.value)
        verts = np.ctypeslib.as_array(pv, (V, 3)).copy()
        faces = np.ctypeslib.as_array(pf, (F, 3)).copy()
        normals = (np.ctypeslib.as_array(pn, (V, 3)).copy()
                   if hn.value else None)
        uvs = (np.ctypeslib.as_array(puv, (V, 2)).copy()
               if huv.value else None)
    finally:
        for p in (pv, pf, pn, puv):
            if p:
                free_fn(ctypes.cast(p, ctypes.c_void_p))
    return verts, faces, normals, uvs


def available() -> bool:
    """True if the native toolchain works on this machine."""
    try:
        _load("mts_bvh", "bvh_builder.cpp")
        return True
    except Exception:
        return False
