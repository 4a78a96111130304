"""Compile-on-demand C++ host kernels with ctypes bindings.

The shared library is rebuilt automatically when the source is newer than the
cached .so (the analogue of the reference's build.rs shader/cargo pipeline,
build.rs:19-229, but for host kernels). Every wrapper degrades gracefully:
callers fall back to the numpy implementations when the toolchain is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "tpurt_native.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _so_path() -> str:
    cache = os.environ.get("TPURT_NATIVE_CACHE",
                           os.path.join(os.path.dirname(__file__), "_build"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libtpurt_native.so")


def get_lib():
    """Return the loaded ctypes library, building it if needed; None if the
    build fails (callers use numpy fallbacks)."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _so_path()
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                     "-fPIC", _SRC, "-o", so],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so)
        except Exception:
            return None

        i8p = ctypes.POINTER(ctypes.c_int8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)

        lib.tpurt_permute_pixels.argtypes = [
            u8p, u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, i8p]
        lib.tpurt_permute_pixels.restype = None

        lib.tpurt_interleave.argtypes = [
            ctypes.POINTER(u8p), i64p, i64p, ctypes.c_int, ctypes.c_int64, u8p]
        lib.tpurt_interleave.restype = None

        lib.tpurt_morton3d.argtypes = [f32p, ctypes.c_int64, f32p, f32p, u32p]
        lib.tpurt_morton3d.restype = None

        lib.tpurt_build_sah.argtypes = [
            f32p, f32p, ctypes.c_int32, ctypes.c_int32,
            f32p, f32p, i32p, i32p, i32p, i32p, i32p]
        lib.tpurt_build_sah.restype = ctypes.c_int32

        lib.tpurt_buddy_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.tpurt_buddy_create.restype = ctypes.c_void_p
        lib.tpurt_buddy_alloc.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                          ctypes.c_int64]
        lib.tpurt_buddy_alloc.restype = ctypes.c_int64
        lib.tpurt_buddy_free.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tpurt_buddy_free.restype = ctypes.c_int
        lib.tpurt_buddy_free_bytes.argtypes = [ctypes.c_void_p]
        lib.tpurt_buddy_free_bytes.restype = ctypes.c_int64
        lib.tpurt_buddy_destroy.argtypes = [ctypes.c_void_p]
        lib.tpurt_buddy_destroy.restype = None
        _LIB = lib
        return _LIB


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def native_permute_pixels(src: np.ndarray, src_ts: int,
                          src_to_dst: dict, dst_ts: int):
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    n = src.size // src_ts
    dst = np.empty(n * dst_ts, np.uint8)
    cmap = np.full(max(src_ts, 1), -1, np.int8)
    for s, d in src_to_dst.items():
        if s < src_ts:
            cmap[s] = d
    lib.tpurt_permute_pixels(_ptr(src, ctypes.c_uint8), _ptr(dst, ctypes.c_uint8),
                             n, src_ts, dst_ts, _ptr(cmap, ctypes.c_int8))
    return dst


def native_interleave(views, dst: np.ndarray):
    """views: list of contiguous-per-row (count, size) u8 strided arrays."""
    lib = get_lib()
    if lib is None:
        return None
    n_attrs = len(views)
    count = views[0].shape[0]
    bases = [np.ascontiguousarray(v) if v.strides[1] != 1 else v for v in views]
    srcs = (ctypes.POINTER(ctypes.c_uint8) * n_attrs)(
        *[_ptr(b, ctypes.c_uint8) for b in bases])
    strides = np.asarray([b.strides[0] for b in bases], np.int64)
    sizes = np.asarray([b.shape[1] for b in bases], np.int64)
    lib.tpurt_interleave(srcs, _ptr(strides, ctypes.c_int64),
                         _ptr(sizes, ctypes.c_int64), n_attrs, count,
                         _ptr(dst, ctypes.c_uint8))
    return dst


def native_morton3d(points: np.ndarray, lo, hi):
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    out = np.empty(len(pts), np.uint32)
    lib.tpurt_morton3d(_ptr(pts, ctypes.c_float), len(pts),
                       _ptr(lo, ctypes.c_float), _ptr(hi, ctypes.c_float),
                       _ptr(out, ctypes.c_uint32))
    return out


def native_build_sah(aabb_min, aabb_max, max_leaf: int):
    """Returns FlatBVH field dict or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    amin = np.ascontiguousarray(aabb_min, np.float32).reshape(-1, 3)
    amax = np.ascontiguousarray(aabb_max, np.float32).reshape(-1, 3)
    n = len(amin)
    if n == 0:
        return None
    cap = max(2 * n, 2)
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    entry = np.empty(cap, np.int32)
    skip = np.empty(cap, np.int32)
    first = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    order = np.empty(n, np.int32)
    m = lib.tpurt_build_sah(
        _ptr(amin, ctypes.c_float), _ptr(amax, ctypes.c_float), n, max_leaf,
        _ptr(node_min, ctypes.c_float), _ptr(node_max, ctypes.c_float),
        _ptr(entry, ctypes.c_int32), _ptr(skip, ctypes.c_int32),
        _ptr(first, ctypes.c_int32), _ptr(count, ctypes.c_int32),
        _ptr(order, ctypes.c_int32))
    if m <= 0:
        return None
    return dict(
        aabb_min=node_min[:m].copy(), aabb_max=node_max[:m].copy(),
        entry=entry[:m].copy(), skip=skip[:m].copy(),
        first_tri=first[:m].copy(), tri_count=count[:m].copy(),
        tri_order=order,
    )
