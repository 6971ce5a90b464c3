"""ctypes bindings for the native host ops (voxelizer + sparse-conv rulebook
builder), with lazy compilation and a pure-numpy fallback.

The .so is built on first use with g++ -O3 and cached next to the source.
Numpy fallbacks implement identical semantics (used when no compiler is
available and as the correctness oracle in tests).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libsparse_ops.so")
_SRC = os.path.join(_HERE, "sparse_ops.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.hard_voxelize.restype = ctypes.c_int32
        lib.hard_voxelize.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                                      f32p, f32p, ctypes.c_int32,
                                      ctypes.c_int32, f32p, i32p, i32p]
        lib.build_subm_rulebook.restype = None
        lib.build_subm_rulebook.argtypes = [i32p, ctypes.c_int32,
                                            ctypes.c_int32, ctypes.c_int32, i32p]
        lib.build_sparse_rulebook.restype = ctypes.c_int32
        lib.build_sparse_rulebook.argtypes = [i32p, ctypes.c_int32, i32p,
                                              ctypes.c_int32, ctypes.c_int32,
                                              ctypes.c_int32, ctypes.c_int32,
                                              i32p, i32p]
        lib.build_sparse_rulebook_aniso.restype = ctypes.c_int32
        lib.build_sparse_rulebook_aniso.argtypes = [i32p, ctypes.c_int32, i32p,
                                                    i32p, i32p, i32p,
                                                    ctypes.c_int32, i32p, i32p]
        _lib = lib
        return _lib


def _p(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def have_native() -> bool:
    return _build() is not None


# --------------------------------------------------------------------------
def hard_voxelize(points: np.ndarray, pc_range, voxel_size, max_points: int,
                  max_voxels: int, use_native: bool = True):
    """Returns (voxels [V,P,F], coords [V,3] (x,y,z), counts [V], n_voxels)."""
    points = np.ascontiguousarray(points, np.float32)
    n, f = points.shape
    rng = np.asarray(pc_range, np.float32)
    vs = np.asarray(voxel_size, np.float32)
    lib = _build() if use_native else None
    if lib is not None:
        voxels = np.zeros((max_voxels, max_points, f), np.float32)
        coords = np.zeros((max_voxels, 3), np.int32)
        counts = np.zeros(max_voxels, np.int32)
        nv = lib.hard_voxelize(_p(points, ctypes.c_float), n, f,
                               _p(rng, ctypes.c_float), _p(vs, ctypes.c_float),
                               max_points, max_voxels,
                               _p(voxels, ctypes.c_float),
                               _p(coords, ctypes.c_int32),
                               _p(counts, ctypes.c_int32))
        return voxels, coords, counts, int(nv)
    # numpy fallback
    nx = np.round((rng[3:] - rng[:3]) / vs).astype(np.int64)
    cell = np.floor((points[:, :3] - rng[:3]) / vs).astype(np.int64)
    ok = np.all((cell >= 0) & (cell < nx), axis=1) & np.all(
        points[:, :3] >= rng[:3], axis=1)
    voxels = np.zeros((max_voxels, max_points, f), np.float32)
    coords = np.zeros((max_voxels, 3), np.int32)
    counts = np.zeros(max_voxels, np.int32)
    vid_of = {}
    nv = 0
    for i in np.nonzero(ok)[0]:
        key = tuple(cell[i])
        vid = vid_of.get(key)
        if vid is None:
            if nv >= max_voxels:
                continue
            vid = nv
            vid_of[key] = vid
            coords[vid] = key
            nv += 1
        c = counts[vid]
        if c < max_points:
            voxels[vid, c] = points[i]
            counts[vid] = c + 1
    return voxels, coords, counts, nv


def build_subm_rulebook(coords: np.ndarray, n_voxels: int, cap: int,
                        kernel: int = 3, use_native: bool = True) -> np.ndarray:
    """Returns gather [kernel^3, cap] int32 (-1 = missing)."""
    coords = np.ascontiguousarray(coords, np.int32)
    lib = _build() if use_native else None
    if lib is not None:
        gather = np.empty((kernel ** 3, cap), np.int32)
        lib.build_subm_rulebook(_p(coords, ctypes.c_int32), n_voxels, cap,
                                kernel, _p(gather, ctypes.c_int32))
        return gather
    gather = np.full((kernel ** 3, cap), -1, np.int32)
    idx_of = {tuple(coords[i]): i for i in range(n_voxels)}
    r = kernel // 2
    k = 0
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            for dz in range(-r, r + 1):
                for o in range(n_voxels):
                    key = (coords[o, 0] + dx, coords[o, 1] + dy, coords[o, 2] + dz)
                    j = idx_of.get(key)
                    if j is not None:
                        gather[k, o] = j
                k += 1
    return gather


def build_sparse_rulebook(coords: np.ndarray, n_voxels: int, in_shape,
                          kernel, stride, pad, cap: int,
                          use_native: bool = True):
    """Returns (out_coords [cap,3], gather [K,cap], n_out). kernel/stride/pad
    may be ints (cubic) or 3-tuples (anisotropic)."""
    coords = np.ascontiguousarray(coords, np.int32)
    shape = np.asarray(in_shape, np.int32)
    aniso = not np.isscalar(kernel)
    lib = _build() if use_native else None
    if aniso:
        kernel = np.asarray(kernel, np.int32)
        stride = np.asarray(stride, np.int32)
        pad = np.asarray(pad, np.int32)
        K = int(np.prod(kernel))
    else:
        K = int(kernel) ** 3
    if lib is not None:
        out_coords = np.zeros((cap, 3), np.int32)
        gather = np.empty((K, cap), np.int32)
        if aniso:
            n_out = lib.build_sparse_rulebook_aniso(
                _p(coords, ctypes.c_int32), n_voxels, _p(shape, ctypes.c_int32),
                _p(kernel, ctypes.c_int32), _p(stride, ctypes.c_int32),
                _p(pad, ctypes.c_int32), cap, _p(out_coords, ctypes.c_int32),
                _p(gather, ctypes.c_int32))
        else:
            n_out = lib.build_sparse_rulebook(
                _p(coords, ctypes.c_int32), n_voxels, _p(shape, ctypes.c_int32),
                int(kernel), int(stride), int(pad), cap,
                _p(out_coords, ctypes.c_int32), _p(gather, ctypes.c_int32))
        return out_coords, gather, int(n_out)
    # numpy fallback
    if not aniso:
        kernel = np.asarray([kernel] * 3, np.int32)
        stride = np.asarray([stride] * 3, np.int32)
        pad = np.asarray([pad] * 3, np.int32)
    out_dim = (shape + 2 * pad - kernel) // stride + 1
    gather = np.full((K, cap), -1, np.int32)
    out_coords = np.zeros((cap, 3), np.int32)
    out_of = {}
    n_out = 0
    k = 0
    for dx in range(kernel[0]):
        for dy in range(kernel[1]):
            for dz in range(kernel[2]):
                for i in range(n_voxels):
                    iv = coords[i] + pad - np.asarray([dx, dy, dz])
                    if np.any(iv < 0) or np.any(iv % stride):
                        continue
                    ov = iv // stride
                    if np.any(ov >= out_dim):
                        continue
                    key = tuple(ov)
                    oid = out_of.get(key)
                    if oid is None:
                        if n_out >= cap:
                            continue
                        oid = n_out
                        out_of[key] = oid
                        out_coords[oid] = ov
                        n_out += 1
                    gather[k, oid] = i
                k += 1
    return out_coords, gather, n_out
