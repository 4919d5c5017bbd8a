"""ctypes bindings for the native runtime (native/raytracer_native.cpp).

Compiles the shared library on demand with g++ (cached next to the
source), and degrades gracefully: every entry point has a pure
Python/numpy fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "raytracer_native.cpp")
_LIB = os.path.join(_HERE, "native", "raytracer_native.so")

_lock = threading.Lock()
_lib = None
_tried = False

i64 = ctypes.c_int64
f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> str | None:
    if not os.path.exists(_SRC):
        return None
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", _LIB + ".tmp", _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(_LIB + ".tmp", _LIB)
        except Exception:
            return None
    return _LIB


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.ply_parse.restype = ctypes.c_int
        lib.ply_parse.argtypes = [ctypes.c_char_p, i64,
                                  ctypes.POINTER(i64), ctypes.POINTER(i64)]
        lib.ply_fetch.argtypes = [f32p, i32p]
        lib.obj_parse.restype = ctypes.c_int
        lib.obj_parse.argtypes = [ctypes.c_char_p, i64] + [ctypes.POINTER(i64)] * 4
        lib.obj_fetch.argtypes = [f32p, f32p, f32p, i32p, i32p, i32p]
        lib.bvh_build.restype = i64
        lib.bvh_build.argtypes = [f32p, f32p, f32p, i32p, i64,
                                  f32p, f32p, i32p, i32p,
                                  ctypes.POINTER(i64), ctypes.POINTER(i64)]
        _lib = lib
        return _lib


def ply_parse_native(data: bytes):
    """Returns (verts (V,3), tris (F,3)) or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nv, nt = i64(0), i64(0)
    if lib.ply_parse(data, len(data), ctypes.byref(nv), ctypes.byref(nt)) != 0:
        return None
    verts = np.empty((nv.value, 3), np.float32)
    tris = np.empty((nt.value, 3), np.int32)
    lib.ply_fetch(verts.reshape(-1), tris.reshape(-1))
    return verts, tris


def obj_parse_native(data: bytes):
    """Returns the load_obj dict or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nv, nn, nt, nf = i64(0), i64(0), i64(0), i64(0)
    if lib.obj_parse(data, len(data), ctypes.byref(nv), ctypes.byref(nn),
                     ctypes.byref(nt), ctypes.byref(nf)) != 0:
        return None
    v = np.empty((nv.value, 3), np.float32)
    vn = np.empty((max(nn.value, 1), 3), np.float32)
    vt = np.empty((max(nt.value, 1), 2), np.float32)
    fp = np.empty((nf.value, 3), np.int32)
    fn = np.empty((nf.value, 3), np.int32)
    ft = np.empty((nf.value, 3), np.int32)
    lib.obj_fetch(v.reshape(-1), vn.reshape(-1), vt.reshape(-1),
                  fp.reshape(-1), fn.reshape(-1), ft.reshape(-1))
    out = {
        "positions": v, "indices": fp,
        "normals": None, "normal_indices": None,
        "texcoords": None, "texcoord_indices": None,
    }
    if nn.value and (fn >= 0).any():
        out["normals"] = vn
        out["normal_indices"] = np.maximum(fn, 0)
    if nt.value and (ft >= 0).any():
        out["texcoords"] = vt
        out["texcoord_indices"] = np.maximum(ft, 0)
    return out


def bvh_build_native(v0, v1, v2, mat):
    """Packed-LBVH arrays via the native builder, or None.

    Returns (child_rows, planes, tri_index, mat_out, p, m_occ) matching
    ops/bvh.py's layout contract.
    """
    lib = get_lib()
    if lib is None:
        return None
    LEAF = 128
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    mat = np.ascontiguousarray(mat, np.int32)
    n = v0.shape[0]
    m_occ = -(-n // LEAF)
    p = 1 << max(0, (m_occ - 1).bit_length())
    m_pad = -(-m_occ // 8) * 8
    child_rows = np.empty((max(p - 1, 1), LEAF), np.float32)
    planes = np.empty((12, m_pad, LEAF), np.float32)
    tri_index = np.empty((m_pad * LEAF,), np.int32)
    mat_out = np.empty((m_pad * LEAF,), np.int32)
    mo, mp = i64(0), i64(0)
    got_p = lib.bvh_build(
        v0.reshape(-1), v1.reshape(-1), v2.reshape(-1), mat, n,
        child_rows.reshape(-1), planes.reshape(-1), tri_index, mat_out,
        ctypes.byref(mo), ctypes.byref(mp))
    if got_p != p or mo.value != m_occ or mp.value != m_pad:
        return None
    return child_rows, planes, tri_index, mat_out, p, m_occ
