"""ctypes bindings for the native host runtime (libtm_native.so).

Builds on first use with g++ (-O3 -fopenmp) if the shared object is missing;
falls back gracefully (``available() == False``) where no toolchain exists.
The compute path stays JAX/TPU — this library covers host-side IO, hashing,
and validation paths that the reference implements natively (see
src/tm_native.cpp header for the inventory).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "tm_native.cpp")
_SO = os.path.join(_HERE, "libtm_native.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", _SO,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:  # no compiler / hang
        return f"{type(e).__name__}: {e}"
    if res.returncode != 0:
        return res.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        # a shipped .so without the src/ tree is usable as-is (stale-check
        # skipped); missing BOTH is a graceful available()==False, not a
        # FileNotFoundError out of getmtime
        have_src = os.path.exists(_SRC)
        stale = (have_src and os.path.exists(_SO)
                 and os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if not os.path.exists(_SO) or stale:
            if not have_src:
                _build_error = f"source not found: {_SRC}"
                return None
            err = _build()
            if err is not None:
                _build_error = err
                return None
        lib = ctypes.CDLL(_SO)
        lib.tm_murmur32.restype = ctypes.c_uint32
        lib.tm_murmur32.argtypes = [ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
        lib.tm_murmur32_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.tm_extract_fields.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.tm_knn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        lib.tm_pair_pass.restype = ctypes.c_int64
        lib.tm_pair_pass.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.tm_grid_knn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        lib.tm_lzf_decompress.restype = ctypes.c_int64
        lib.tm_lzf_decompress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.tm_lzf_compress.restype = ctypes.c_int64
        lib.tm_lzf_compress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def _require():
    """The loaded library, or a RuntimeError carrying the build error —
    callers that skipped the ``available()`` gate get the real reason
    instead of an opaque NoneType AttributeError."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"tm_native unavailable: {_build_error}")
    return lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def murmur32(keys: np.ndarray) -> np.ndarray:
    """[N, D] uint32 -> [N] uint32 (bit-compatible with the reference)."""
    lib = _require()
    keys = np.ascontiguousarray(keys, np.uint32)
    if keys.ndim == 1:
        keys = keys[None, :]
    n, d = keys.shape
    out = np.empty(n, np.uint32)
    lib.tm_murmur32_batch(_ptr(keys, ctypes.c_uint32), n, d, _ptr(out, ctypes.c_uint32))
    return out


def extract_fields(data: bytes | np.ndarray, n: int, stride: int, offsets) -> np.ndarray:
    """Strided float32 field extraction from binary records -> [n, ncols]."""
    lib = _require()
    buf = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else data
    offs = np.asarray(offsets, np.int32)
    out = np.empty((n, len(offs)), np.float32)
    lib.tm_extract_fields(
        _ptr(buf, ctypes.c_uint8), n, stride, _ptr(offs, ctypes.c_int), len(offs),
        _ptr(out, ctypes.c_float),
    )
    return out


def knn(q: np.ndarray, r: np.ndarray, k: int, valid: np.ndarray | None = None):
    """Host brute-force kNN: returns (idx [nq,k] int32, d2 [nq,k] f32)."""
    lib = _require()
    q = np.ascontiguousarray(q, np.float32)
    r = np.ascontiguousarray(r, np.float32)
    v = None if valid is None else np.ascontiguousarray(valid, np.uint8)
    idx = np.empty((q.shape[0], k), np.int32)
    d2 = np.empty((q.shape[0], k), np.float32)
    lib.tm_knn(
        _ptr(q, ctypes.c_float), q.shape[0], _ptr(r, ctypes.c_float), r.shape[0],
        None if v is None else _ptr(v, ctypes.c_uint8), k,
        _ptr(idx, ctypes.c_int32), _ptr(d2, ctypes.c_float),
    )
    return idx, d2


def pair_bounds(xyz, tangent, edge, lower, upper, parallel_eps=0.01):
    """Pass 1 of the model pair pass: (min_dist, max_dist, valid_count)."""
    lib = _require()
    xyz = np.ascontiguousarray(xyz, np.float32)
    tangent = np.ascontiguousarray(tangent, np.float32)
    edge = np.ascontiguousarray(edge, np.uint8)
    bounds = np.empty(2, np.float32)
    cnt = lib.tm_pair_pass(
        _ptr(xyz, ctypes.c_float), _ptr(tangent, ctypes.c_float),
        _ptr(edge, ctypes.c_uint8), xyz.shape[0],
        lower, upper, parallel_eps, 0.0, 1.0, 1, 1.0,
        _ptr(bounds, ctypes.c_float), None,
    )
    return float(bounds[0]), float(bounds[1]), int(cnt)


def pair_keys(xyz, tangent, edge, lower, upper, bmin0, brange0, dist_steps,
              angle_step, parallel_eps=0.01):
    """Pass 2: packed uint32 keys [n, n] (0xFFFFFFFF = invalid pair)."""
    lib = _require()
    xyz = np.ascontiguousarray(xyz, np.float32)
    tangent = np.ascontiguousarray(tangent, np.float32)
    edge = np.ascontiguousarray(edge, np.uint8)
    n = xyz.shape[0]
    keys = np.empty((n, n), np.uint32)
    lib.tm_pair_pass(
        _ptr(xyz, ctypes.c_float), _ptr(tangent, ctypes.c_float),
        _ptr(edge, ctypes.c_uint8), n,
        lower, upper, parallel_eps, bmin0, brange0, dist_steps, angle_step,
        None, _ptr(keys, ctypes.c_uint32),
    )
    return keys


def lzf_decompress(data: bytes, out_size: int) -> np.ndarray:
    """LZF stream -> [out_size] uint8 (PCD binary_compressed payloads)."""
    lib = _require()
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(out_size, np.uint8)
    got = lib.tm_lzf_decompress(
        _ptr(buf, ctypes.c_uint8), buf.size, _ptr(out, ctypes.c_uint8), out_size
    )
    if got != out_size:
        raise ValueError(f"LZF decompress produced {got} bytes, expected {out_size}")
    return out


def lzf_compress(data: bytes | np.ndarray) -> bytes:
    """uint8 payload -> LZF stream (liblzf-compatible)."""
    lib = _require()
    buf = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else np.ascontiguousarray(data, np.uint8)
    cap = buf.size + buf.size // 16 + 64  # literal-only worst case + slack
    out = np.empty(cap, np.uint8)
    got = lib.tm_lzf_compress(
        _ptr(buf, ctypes.c_uint8), buf.size, _ptr(out, ctypes.c_uint8), cap
    )
    if got <= 0 and buf.size > 0:
        raise ValueError("LZF compress overflow")
    return out[:got].tobytes()


def grid_knn(q: np.ndarray, r: np.ndarray, k: int, cell: float,
             valid: np.ndarray | None = None):
    """Grid-accelerated host kNN (one-ring stencil; exact when the true
    neighbors lie within ``cell``).  Returns (idx [nq,k] int32, d2 [nq,k])."""
    lib = _require()
    q = np.ascontiguousarray(q, np.float32)
    r = np.ascontiguousarray(r, np.float32)
    v = None if valid is None else np.ascontiguousarray(valid, np.uint8)
    idx = np.empty((q.shape[0], k), np.int32)
    d2 = np.empty((q.shape[0], k), np.float32)
    lib.tm_grid_knn(
        _ptr(q, ctypes.c_float), q.shape[0], _ptr(r, ctypes.c_float), r.shape[0],
        None if v is None else _ptr(v, ctypes.c_uint8), k, float(cell),
        _ptr(idx, ctypes.c_int32), _ptr(d2, ctypes.c_float),
    )
    return idx, d2
