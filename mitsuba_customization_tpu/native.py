"""ctypes bindings to the native runtime library (native/mct_native.cpp).

TPU-native counterpart of the reference's C++ host runtime (SURVEY.md §2.3):
fast MERL IO, BVH build, OBJ parsing. Every entry point has a pure-Python
fallback (models/merl.py, render/bvh.py, utils/obj.py), so the framework
works without the library; `available()` reports whether the fast path is
loaded. Build with native/build.sh.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB = None
_SEARCH = [
    Path(__file__).parent.parent / "native" / "libmct_native.so",
    Path(__file__).parent / "libmct_native.so",
]


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for p in _SEARCH:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.mct_read_merl.restype = ctypes.c_int
            lib.mct_build_bvh.restype = ctypes.c_int
            lib.mct_parse_obj.restype = ctypes.c_int
            _LIB = lib
            return lib
    _LIB = False
    return False


def available():
    return bool(_load())


def read_merl(path, dims=(90, 90, 180)):
    """Native MERL reader -> (n_th, n_td, n_pd, 3) float32, or None if the
    library is unavailable. Raises ValueError on malformed files."""
    lib = _load()
    if not lib:
        return None
    out = np.empty((*dims, 3), dtype=np.float32)
    rc = lib.mct_read_merl(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dims[0], dims[1], dims[2],
    )
    if rc == -3:
        raise ValueError(f"{path}: MERL dims != {dims}")
    if rc != 0:
        raise ValueError(f"{path}: MERL read failed (code {rc})")
    return out


def build_bvh(bb_min, bb_max, leaf_size=4, n_bins=16):
    """Native binned-SAH build -> (nodes_min, nodes_max, skip, leaf_prims)
    numpy arrays in the render/bvh.py layout, or None if unavailable."""
    lib = _load()
    if not lib:
        return None
    bb_min = np.ascontiguousarray(bb_min, dtype=np.float32)
    bb_max = np.ascontiguousarray(bb_max, dtype=np.float32)
    n = bb_min.shape[0]
    max_nodes = max(2 * n, 1)
    nodes_min = np.empty((max_nodes, 3), np.float32)
    nodes_max = np.empty((max_nodes, 3), np.float32)
    skip = np.empty(max_nodes, np.int32)
    leaf = np.empty((max_nodes, leaf_size), np.int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    n_nodes = lib.mct_build_bvh(
        bb_min.ctypes.data_as(f32p), bb_max.ctypes.data_as(f32p),
        n, leaf_size, n_bins,
        nodes_min.ctypes.data_as(f32p), nodes_max.ctypes.data_as(f32p),
        skip.ctypes.data_as(i32p), leaf.ctypes.data_as(i32p), max_nodes,
    )
    if n_nodes < 0:
        raise RuntimeError(f"native BVH build failed (code {n_nodes})")
    return (
        nodes_min[:n_nodes].copy(),
        nodes_max[:n_nodes].copy(),
        skip[:n_nodes].copy(),
        leaf[:n_nodes].copy(),
    )


def parse_obj(path):
    """Native OBJ triangle parse -> (verts (V,3) f32, faces (F,3) i32), or
    None if unavailable. Positions-only fast path (normals/uvs fall back
    to the Python parser in utils/obj.py)."""
    lib = _load()
    if not lib:
        return None
    nv = ctypes.c_int32(0)
    nf = ctypes.c_int32(0)
    rc = lib.mct_parse_obj(
        str(path).encode(), None, None, ctypes.byref(nv), ctypes.byref(nf)
    )
    if rc != 0:
        raise ValueError(f"{path}: OBJ parse failed (code {rc})")
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nf.value, 3), np.int32)
    rc = lib.mct_parse_obj(
        str(path).encode(),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(nv), ctypes.byref(nf),
    )
    if rc != 0:
        raise ValueError(f"{path}: OBJ parse failed (code {rc})")
    return verts, faces
