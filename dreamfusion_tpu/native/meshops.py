"""ctypes binding for the native meshops library (src/meshops.cpp).

Mirrors the reference's mesh tool stack — PyMCubes marching cubes
(/root/reference/nerf/renderer.py:410), pymeshlab clean/decimate
(/root/reference/meshutils.py:39-116) and xatlas UV unwrap
(renderer.py:442-447) — with a from-scratch C++ implementation, JIT-built
on first use (the same pattern as the reference's
torch.utils.cpp_extension backends, e.g. raymarching/backend.py:32-39).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "meshops.cpp")
_SO = os.path.join(_HERE, "_meshops.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build() -> str:
    hdr = os.path.join(_HERE, "src", "mc_tables.h")
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < max(os.path.getmtime(_SRC),
                                           os.path.getmtime(hdr))):
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC",
               "-shared", _SRC, "-o", _SO + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
    return _SO


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build())
            P = ctypes.POINTER
            f32p = P(ctypes.c_float)
            i32p = P(ctypes.c_int32)
            i64p = P(ctypes.c_int64)
            lib.mops_marching_cubes.restype = ctypes.c_void_p
            lib.mops_marching_cubes.argtypes = [
                f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_float]
            lib.mops_clean.restype = ctypes.c_void_p
            lib.mops_clean.argtypes = [
                f32p, ctypes.c_int64, i32p, ctypes.c_int64,
                ctypes.c_float, ctypes.c_int32, ctypes.c_float]
            lib.mops_decimate.restype = ctypes.c_void_p
            lib.mops_decimate.argtypes = [
                f32p, ctypes.c_int64, i32p, ctypes.c_int64, ctypes.c_int64]
            lib.mops_unwrap.restype = ctypes.c_void_p
            lib.mops_unwrap.argtypes = [
                f32p, ctypes.c_int64, i32p, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_float, ctypes.c_float]
            lib.mops_counts.restype = None
            lib.mops_counts.argtypes = [ctypes.c_void_p, i64p, i64p]
            lib.mops_copy.restype = None
            lib.mops_copy.argtypes = [ctypes.c_void_p, f32p, i32p]
            lib.mops_get_uv.restype = None
            lib.mops_get_uv.argtypes = [ctypes.c_void_p, f32p]
            lib.mops_get_src.restype = None
            lib.mops_get_src.argtypes = [ctypes.c_void_p, i32p]
            lib.mops_free.restype = None
            lib.mops_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
    return _LIB


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _take(lib, handle, with_uv=False, with_src=False):
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    lib.mops_counts(handle, ctypes.byref(nv), ctypes.byref(nt))
    verts = np.empty((nv.value, 3), np.float32)
    tris = np.empty((nt.value, 3), np.int32)
    lib.mops_copy(handle, _f32p(verts), _i32p(tris))
    out = [verts, tris]
    if with_uv:
        uv = np.empty((nv.value, 2), np.float32)
        lib.mops_get_uv(handle, _f32p(uv))
        out.append(uv)
    if with_src:
        src = np.empty((nv.value,), np.int32)
        lib.mops_get_src(handle, _i32p(src))
        out.append(src)
    lib.mops_free(handle)
    return tuple(out)


def marching_cubes(grid: np.ndarray, iso: float
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """grid [X,Y,Z] float; surface of {grid > iso}.  Returns vertices in
    index space [nv,3] float32 and triangles [nt,3] int32 (outward CCW)."""
    grid = np.ascontiguousarray(grid, np.float32)
    lib = _lib()
    h = lib.mops_marching_cubes(_f32p(grid), grid.shape[0], grid.shape[1],
                                grid.shape[2], float(iso))
    return _take(lib, h)


def clean_mesh(verts: np.ndarray, tris: np.ndarray, weld_eps: float = 1e-5,
               min_faces: int = 8, min_frac: float = 0.0
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Weld near-duplicate vertices, drop degenerate faces and connected
    components smaller than max(min_faces, min_frac·largest)."""
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    lib = _lib()
    h = lib.mops_clean(_f32p(verts), len(verts), _i32p(tris), len(tris),
                       float(weld_eps), int(min_faces), float(min_frac))
    return _take(lib, h)


def decimate_mesh(verts: np.ndarray, tris: np.ndarray, target_faces: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Quadric edge-collapse decimation to ~target_faces."""
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    lib = _lib()
    h = lib.mops_decimate(_f32p(verts), len(verts), _i32p(tris), len(tris),
                          int(target_faces))
    return _take(lib, h)


def unwrap_uv(verts: np.ndarray, tris: np.ndarray, atlas_res: int = 1024,
              padding_px: float = 2.0, max_angle_deg: float = 45.0
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Chart-growth UV atlas.  Returns (verts', tris', uv, src) where verts'
    duplicates chart-boundary vertices and src maps each output vertex back
    to its input vertex (for attribute transfer)."""
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    lib = _lib()
    h = lib.mops_unwrap(_f32p(verts), len(verts), _i32p(tris), len(tris),
                        int(atlas_res), float(padding_px),
                        float(max_angle_deg))
    return _take(lib, h, with_uv=True, with_src=True)
