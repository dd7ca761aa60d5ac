"""Native runtime components (C++ via ctypes) with pure-numpy fallbacks.

The reference is 100% native (Rust); the TPU rebuild keeps the host-side
runtime native too: the BVH builder and the COBS codec compile to
librtw_native.so (see Makefile — plain `make` in this directory, or the
lazy auto-build below). Every entry point has a numpy fallback with
identical output so the package works before/without the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "librtw_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # toolchain absent: fall back silently
            warnings.warn(f"native build unavailable ({e}); using numpy "
                          "fallbacks")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        warnings.warn(f"could not load {_LIB_PATH}: {e}")
        return None

    lib.rtw_build_bvh.restype = ctypes.c_int32
    lib.rtw_build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rtw_cobs_encode.restype = ctypes.c_int32
    lib.rtw_cobs_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.rtw_cobs_decode.restype = ctypes.c_int32
    lib.rtw_cobs_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return _lib


def have_native() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# BVH build: flat DFS layout with skip links (see bvh_builder.cpp header)
# ---------------------------------------------------------------------------

def build_bvh(bmin: np.ndarray, bmax: np.ndarray, leaf_size: int = 1):
    """Build a flattened BVH. Returns (node_bmin, node_bmax, prim, skip).

    prim[i] >= 0 marks a leaf holding that primitive; skip[i] is the next
    node index after i's subtree (the miss pointer of stackless traversal).
    """
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    n = bmin.shape[0]
    if n == 0:
        z3 = np.zeros((0, 3), np.float32)
        z = np.zeros((0,), np.int32)
        return z3, z3, z, z

    lib = _load()
    if lib is not None:
        cap = 2 * n
        out_bmin = np.empty((cap, 3), np.float32)
        out_bmax = np.empty((cap, 3), np.float32)
        out_prim = np.empty((cap,), np.int32)
        out_skip = np.empty((cap,), np.int32)
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        count = lib.rtw_build_bvh(
            bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp), n, leaf_size,
            out_bmin.ctypes.data_as(fp), out_bmax.ctypes.data_as(fp),
            out_prim.ctypes.data_as(ip), out_skip.ctypes.data_as(ip))
        return (out_bmin[:count].copy(), out_bmax[:count].copy(),
                out_prim[:count].copy(), out_skip[:count].copy())

    return _build_bvh_numpy(bmin, bmax, leaf_size)


def _build_bvh_numpy(bmin, bmax, leaf_size=1):
    """Numpy fallback: identical layout/splits as the C++ builder."""
    centroids = 0.5 * (bmin + bmax)

    nodes_bmin, nodes_bmax, prim, skip = [], [], [], []

    def rec(ids):
        if len(ids) <= leaf_size:
            for i in ids:
                nodes_bmin.append(bmin[i])
                nodes_bmax.append(bmax[i])
                prim.append(i)
            return
        lo = bmin[ids].min(0)
        hi = bmax[ids].max(0)
        c = centroids[ids]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        order = np.argsort(c[:, axis], kind="stable")
        ids = ids[order]
        mid = len(ids) // 2
        nodes_bmin.append(lo)
        nodes_bmax.append(hi)
        prim.append(-1)
        rec(ids[:mid])
        rec(ids[mid:])

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        rec(np.arange(bmin.shape[0]))
    finally:
        sys.setrecursionlimit(old)

    prim_arr = np.asarray(prim, np.int32)
    n = len(prim_arr)
    size = np.ones(n, np.int64)
    for i in range(n - 1, -1, -1):
        if prim_arr[i] < 0:
            left = i + 1
            right = left + size[left]
            size[i] = 1 + size[left] + size[right]
    skip_arr = (np.arange(n) + size).astype(np.int32)
    return (np.asarray(nodes_bmin, np.float32),
            np.asarray(nodes_bmax, np.float32), prim_arr, skip_arr)


# ---------------------------------------------------------------------------
# COBS codec
# ---------------------------------------------------------------------------

def cobs_encode(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        from raytracer_weekend_tpu.parallel.stream import cobs_encode as pyenc
        return pyenc(data)
    src = np.frombuffer(data, np.uint8)
    dst = np.empty(len(data) + len(data) // 254 + 2, np.uint8)
    up = ctypes.POINTER(ctypes.c_uint8)
    n = lib.rtw_cobs_encode(
        np.ascontiguousarray(src).ctypes.data_as(up), len(data),
        dst.ctypes.data_as(up))
    return dst[:n].tobytes()


def cobs_decode(frame: bytes) -> bytes:
    lib = _load()
    if lib is None:
        from raytracer_weekend_tpu.parallel.stream import cobs_decode as pydec
        return pydec(frame)
    src = np.frombuffer(frame, np.uint8)
    dst = np.empty(max(len(frame), 1), np.uint8)
    up = ctypes.POINTER(ctypes.c_uint8)
    n = lib.rtw_cobs_decode(
        np.ascontiguousarray(src).ctypes.data_as(up), len(frame),
        dst.ctypes.data_as(up))
    if n < 0:
        raise ValueError("malformed COBS frame")
    return dst[:n].tobytes()
