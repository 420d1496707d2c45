"""ctypes bindings for the native host runtime (native/voxelhash.cpp).

The C++ library accelerates the host-side data pipeline — voxel dedup,
kernel-map construction (the MinkowskiEngine CoordinateManager role), FPS
and ball query oracles. Every entry point falls back to NumPy when the
shared library is absent; ``ensure_built`` compiles it on demand with g++.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libs3dnative.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def ensure_built(rebuild: bool = False) -> bool:
    """Build the shared library if needed. Returns availability."""
    global _lib, _tried
    if _lib is not None and not rebuild:
        return True
    if not os.path.exists(_SO_PATH) or rebuild:
        src = os.path.join(_NATIVE_DIR, "voxelhash.cpp")
        if not os.path.exists(src):
            return False
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17",
                 "-fopenmp", "-shared", "-o", _SO_PATH, src],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return False
    return _load()


def _load() -> bool:
    global _lib, _tried
    _tried = True
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return False
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.s3d_sparse_quantize.restype = ctypes.c_int64
    lib.s3d_sparse_quantize.argtypes = [i32p, ctypes.c_int64, i32p, i32p]
    lib.s3d_kernel_map.restype = None
    lib.s3d_kernel_map.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                                   i32p, ctypes.c_int64, i32p, ctypes.c_int32,
                                   ctypes.c_int32, i32p]
    lib.s3d_downsample.restype = ctypes.c_int64
    lib.s3d_downsample.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, i32p]
    lib.s3d_fps.restype = None
    lib.s3d_fps.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32, i32p]
    lib.s3d_ball_query.restype = None
    lib.s3d_ball_query.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                                   ctypes.c_float, ctypes.c_int32, i32p]
    _lib = lib
    return True


def available() -> bool:
    if _lib is not None:
        return True
    if not _tried and os.path.exists(_SO_PATH):
        return _load()
    return False


def _i32(a: np.ndarray):
    return np.ascontiguousarray(a, np.int32)


def sparse_quantize(coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """First-occurrence dedup; returns (first_index, inverse)."""
    n = len(coords)
    if available():
        c = _i32(coords)
        first = np.empty(n, np.int32)
        inv = np.empty(n, np.int32)
        nu = _lib.s3d_sparse_quantize(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
            first.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            inv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return first[:nu].astype(np.int64), inv.astype(np.int64)
    from situation3d_tpu.ops.voxelize import sparse_quantize_np
    return sparse_quantize_np(coords)


def kernel_map(in_coords: np.ndarray, in_stride: int, out_coords: np.ndarray,
               offsets: np.ndarray, offset_stride: int) -> np.ndarray:
    """Neighbor map [n_out, k]; miss == n_in (kernel_map.py semantics)."""
    n_in, n_out, k = len(in_coords), len(out_coords), len(offsets)
    if available():
        ic, oc, of = _i32(in_coords), _i32(out_coords), _i32(offsets)
        out = np.empty((n_out, k), np.int32)
        p = ctypes.POINTER(ctypes.c_int32)
        _lib.s3d_kernel_map(ic.ctypes.data_as(p), n_in, in_stride,
                            oc.ctypes.data_as(p), n_out,
                            of.ctypes.data_as(p), k, offset_stride,
                            out.ctypes.data_as(p))
        return out
    table = {tuple(c // in_stride): i for i, c in
             enumerate(np.asarray(in_coords))}
    out = np.full((n_out, k), n_in, np.int32)
    for j, c in enumerate(np.asarray(out_coords)):
        for o in range(k):
            q = c + offsets[o] * offset_stride
            if (q % in_stride == 0).all() and (q >= 0).all():
                out[j, o] = table.get(tuple(q // in_stride), n_in)
    return out


def downsample(coords: np.ndarray, new_stride: int) -> np.ndarray:
    """Unique stride-reduced coords, first-occurrence order."""
    n = len(coords)
    if available():
        c = _i32(coords)
        out = np.empty((n, 3), np.int32)
        p = ctypes.POINTER(ctypes.c_int32)
        nu = _lib.s3d_downsample(c.ctypes.data_as(p), n, new_stride,
                                 out.ctypes.data_as(p))
        return out[:nu].copy()
    down = (np.asarray(coords) // new_stride) * new_stride
    from situation3d_tpu.ops.voxelize import sparse_quantize_np
    first, _ = sparse_quantize_np(down)
    return down[first]


def fps(xyz: np.ndarray, m: int) -> np.ndarray:
    n = len(xyz)
    if available():
        x = np.ascontiguousarray(xyz, np.float32)
        out = np.empty(m, np.int32)
        _lib.s3d_fps(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, m,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    temp = np.full(n, 1e10)
    mag = (xyz ** 2).sum(-1)
    out = np.zeros(m, np.int32)
    old = 0
    for j in range(1, m):
        d = ((xyz - xyz[old]) ** 2).sum(-1)
        temp = np.minimum(temp, d)
        old = int(np.argmax(np.where(mag > 1e-3, temp, -1.0)))
        out[j] = old
    return out


def ball_query(xyz: np.ndarray, centers: np.ndarray, radius: float,
               nsample: int) -> np.ndarray:
    if available():
        x = np.ascontiguousarray(xyz, np.float32)
        c = np.ascontiguousarray(centers, np.float32)
        out = np.empty((len(centers), nsample), np.int32)
        _lib.s3d_ball_query(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(c),
            radius, nsample,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    raise NotImplementedError("numpy fallback: use ops.pointnet2.ball_query")
