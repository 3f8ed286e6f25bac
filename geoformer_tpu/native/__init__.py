"""ctypes bindings for the native host ops (with pure-numpy fallbacks).

The shared library is compiled lazily with g++ on first import and cached
next to the source; if no toolchain is available every entry point falls
back to numpy with identical semantics. See host_ops.cpp for the contract
(reference parity notes inline there).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_ops.cpp")
_LIB_PATH = os.path.join(_HERE, "_host_ops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.voxelize_idx.restype = ctypes.c_int32
        lib.voxelize_idx.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int32,
                                     i32p, i32p, i32p]
        lib.voxel_rulebook.restype = None
        lib.voxel_rulebook.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                                       ctypes.c_int32, i32p]
        lib.elastic_blur3.restype = None
        lib.elastic_blur3.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32,
                                      ctypes.c_int32]
        lib.trilinear_gather.restype = None
        lib.trilinear_gather.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32,
                                         ctypes.c_int32, ctypes.c_float, f32p,
                                         ctypes.c_int64, f32p]
        _lib = lib
        return _lib


def _i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def voxelize_idx(coords: np.ndarray, batch: np.ndarray | None = None,
                 spatial: int = 1024):
    """Host voxel dedup (reference PG_OP.voxelization_idx, mode-agnostic
    part). coords [N,3] int32 >= 0 -> (input_map [N] int32 point->voxel,
    voxel_coords [M,3] int32 in sorted-key order, counts [M] int32)."""
    coords = _i32(coords)
    n = coords.shape[0]
    lib = get_lib()
    if lib is not None and n > 0:
        input_map = np.empty(n, np.int32)
        vox = np.empty((n, 3), np.int32)
        counts = np.empty(n, np.int32)
        b = _i32(batch) if batch is not None else None
        m = lib.voxelize_idx(
            _ptr(coords, ctypes.c_int32),
            _ptr(b, ctypes.c_int32) if b is not None else None,
            n, spatial,
            _ptr(input_map, ctypes.c_int32), _ptr(vox, ctypes.c_int32),
            _ptr(counts, ctypes.c_int32),
        )
        return input_map, vox[:m].copy(), counts[:m].copy()
    # numpy fallback: unique on packed int64 keys
    b = np.zeros(n, np.int64) if batch is None else batch.astype(np.int64)
    s = np.int64(spatial)
    key = ((b * s + coords[:, 2]) * s + coords[:, 1]) * s + coords[:, 0]
    ukeys, input_map, counts = np.unique(key, return_inverse=True, return_counts=True)
    first = np.zeros(len(ukeys), np.int64)
    seen = np.full(len(ukeys), -1, np.int64)
    idx_sorted = np.argsort(input_map, kind="stable")
    seen_keys = input_map[idx_sorted]
    firsts = np.searchsorted(seen_keys, np.arange(len(ukeys)))
    first = idx_sorted[firsts]
    return input_map.astype(np.int32), coords[first], counts.astype(np.int32)


def voxel_rulebook(input_map: np.ndarray, n_voxels: int, max_active: int):
    """Voxel -> point-list rulebook [M, 1+max_active] (reference
    output_map layout, voxelize.cpp:107-151: col 0 = count, -1 padding)."""
    input_map = _i32(input_map)
    lib = get_lib()
    out = np.empty((n_voxels, 1 + max_active), np.int32)
    if lib is not None:
        lib.voxel_rulebook(
            _ptr(input_map, ctypes.c_int32), input_map.shape[0],
            n_voxels, max_active, _ptr(out, ctypes.c_int32),
        )
        return out
    out[:, 0] = 0
    out[:, 1:] = -1
    for i, v in enumerate(input_map):
        c = out[v, 0]
        if c < max_active:
            out[v, 1 + c] = i
        out[v, 0] = c + 1
    np.minimum(out[:, 0], max_active, out=out[:, 0])
    return out


def elastic_blur(noise: np.ndarray) -> np.ndarray:
    """Six 3-tap box blur passes over 3 noise grids [3,dx,dy,dz] (the
    reference's blur0/blur1/blur2 x2, scannetv2_inst.py:146-152)."""
    noise = _f32(noise)
    lib = get_lib()
    if lib is not None:
        out = noise.copy()
        lib.elastic_blur3(_ptr(out, ctypes.c_float), *noise.shape[1:])
        return out
    import scipy.ndimage

    blur0 = np.ones((3, 1, 1), np.float32) / 3
    blur1 = np.ones((1, 3, 1), np.float32) / 3
    blur2 = np.ones((1, 1, 3), np.float32) / 3
    grids = [g for g in noise]
    for blur in (blur0, blur1, blur2, blur0, blur1, blur2):
        grids = [scipy.ndimage.convolve(g, blur, mode="constant", cval=0) for g in grids]
    return np.stack(grids)


def trilinear_gather(noise: np.ndarray, gran: float, pts: np.ndarray) -> np.ndarray:
    """Sample 3 grids at pts with the reference's axis convention
    (scannetv2_inst.py:153-158); out-of-bounds -> 0. -> [N,3]."""
    noise, pts = _f32(noise), _f32(pts)
    lib = get_lib()
    if lib is not None:
        out = np.empty((pts.shape[0], 3), np.float32)
        lib.trilinear_gather(
            _ptr(noise, ctypes.c_float), *noise.shape[1:], gran,
            _ptr(pts, ctypes.c_float), pts.shape[0], _ptr(out, ctypes.c_float),
        )
        return out
    import scipy.interpolate

    d = noise.shape[1:]
    ax = [np.linspace(-(b - 1) * gran, (b - 1) * gran, b) for b in d]
    interp = [
        scipy.interpolate.RegularGridInterpolator(
            ax, n, bounds_error=False, fill_value=0
        )
        for n in noise
    ]
    return np.stack([i(pts) for i in interp], axis=1).astype(np.float32)
