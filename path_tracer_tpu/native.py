"""ctypes bindings for the native host runtime (native/pt_native.cpp).

Builds the shared library on first use with g++ (no pybind11 in the image —
plain C ABI + ctypes). Falls back silently to the NumPy implementations when
a compiler is unavailable; `scene` call sites choose via `available()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "pt_native.cpp")
_LIB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_LIB = os.path.join(_LIB_DIR, "libpt_native.so")

_lock = threading.Lock()
_lib = None
_tried = False

_F32P = ctypes.POINTER(ctypes.c_float)
_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC) or not _build():
            return None
        lib = ctypes.CDLL(_LIB)
        lib.pt_free.argtypes = [ctypes.c_void_p]
        lib.obj_load.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(_F32P),
            ctypes.POINTER(_F32P),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.obj_load.restype = ctypes.c_int
        lib.bvh_build.argtypes = [
            _F32P, _F32P, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(_I64P),
            ctypes.POINTER(_F32P), ctypes.POINTER(_F32P),
            ctypes.POINTER(_F32P), ctypes.POINTER(_F32P),
            ctypes.POINTER(_I32P), ctypes.POINTER(_I32P),
            ctypes.POINTER(_I32P), ctypes.POINTER(_I32P),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.bvh_build.restype = ctypes.c_int64
        lib.chunk_build.argtypes = [
            _F32P, _F32P, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(_I64P), ctypes.POINTER(_I64P), ctypes.POINTER(_I64P),
        ]
        lib.chunk_build.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _take(lib, ptr, count, np_dtype, shape):
    """Copy a malloc'd C array into NumPy and free it."""
    ctype = {np.float32: ctypes.c_float, np.int32: ctypes.c_int32, np.int64: ctypes.c_int64}[np_dtype]
    arr = np.ctypeslib.as_array(ctypes.cast(ptr, ctypes.POINTER(ctype)), shape=(count,)).copy()
    lib.pt_free(ptr)
    return arr.astype(np_dtype, copy=False).reshape(shape)


def load_obj(path) -> tuple[np.ndarray, np.ndarray]:
    """Native OBJ parse; same output as `scene.objio.load_obj`."""
    lib = _load()
    assert lib is not None
    pos_p, nrm_p = _F32P(), _F32P()
    n_tris = ctypes.c_int64()
    rc = lib.obj_load(str(path).encode(), ctypes.byref(pos_p), ctypes.byref(nrm_p), ctypes.byref(n_tris))
    if rc != 0:
        raise FileNotFoundError(path)
    t = n_tris.value
    pos = _take(lib, pos_p, t * 9, np.float32, (t, 3, 3))
    nrm = _take(lib, nrm_p, t * 9, np.float32, (t, 3, 3))
    return pos, nrm


def build_bvh(aabb_min: np.ndarray, aabb_max: np.ndarray, max_leaf: int = 4):
    """Native SAH build; same output contract as `scene.bvh.build_bvh`."""
    lib = _load()
    assert lib is not None
    n = aabb_min.shape[0]
    bbmin = np.ascontiguousarray(aabb_min, np.float32)
    bbmax = np.ascontiguousarray(aabb_max, np.float32)

    perm_p = _I64P()
    f = [_F32P() for _ in range(4)]
    i = [_I32P() for _ in range(4)]
    depth = ctypes.c_int64()
    m = lib.bvh_build(
        bbmin.ctypes.data_as(_F32P), bbmax.ctypes.data_as(_F32P),
        n, max_leaf,
        ctypes.byref(perm_p),
        ctypes.byref(f[0]), ctypes.byref(f[1]), ctypes.byref(f[2]), ctypes.byref(f[3]),
        ctypes.byref(i[0]), ctypes.byref(i[1]), ctypes.byref(i[2]), ctypes.byref(i[3]),
        ctypes.byref(depth),
    )
    if m < 0:
        raise ValueError("bvh_build failed")
    perm = _take(lib, perm_p, n, np.int64, (n,))
    flat = {
        "c0_min": _take(lib, f[0], m * 3, np.float32, (m, 3)),
        "c0_max": _take(lib, f[1], m * 3, np.float32, (m, 3)),
        "c1_min": _take(lib, f[2], m * 3, np.float32, (m, 3)),
        "c1_max": _take(lib, f[3], m * 3, np.float32, (m, 3)),
        "c0_idx": _take(lib, i[0], m, np.int32, (m,)),
        "c0_count": _take(lib, i[1], m, np.int32, (m,)),
        "c1_idx": _take(lib, i[2], m, np.int32, (m,)),
        "c1_count": _take(lib, i[3], m, np.int32, (m,)),
    }
    flat["root_min"] = np.minimum(
        flat["c0_min"][0],
        np.where(flat["c1_count"][0] == -1, np.inf, flat["c1_min"][0]),
    ).astype(np.float32)
    flat["root_max"] = np.maximum(
        flat["c0_max"][0],
        np.where(flat["c1_count"][0] == -1, -np.inf, flat["c1_max"][0]),
    ).astype(np.float32)
    return flat, perm, int(depth.value)


def chunk_partition(aabb_min: np.ndarray, aabb_max: np.ndarray, chunk: int):
    """Native spatial chunk partition; same output contract (and
    bit-identical results, tests/test_native.py) as
    `scene.bvh.chunk_partition_py`."""
    lib = _load()
    assert lib is not None
    n = aabb_min.shape[0]
    bbmin = np.ascontiguousarray(aabb_min, np.float32)
    bbmax = np.ascontiguousarray(aabb_max, np.float32)
    perm_p, starts_p, spans_p = _I64P(), _I64P(), _I64P()
    k = lib.chunk_build(
        bbmin.ctypes.data_as(_F32P), bbmax.ctypes.data_as(_F32P),
        n, chunk,
        ctypes.byref(perm_p), ctypes.byref(starts_p), ctypes.byref(spans_p),
    )
    if k < 0:
        raise ValueError("chunk_build failed")
    perm = _take(lib, perm_p, n, np.int64, (n,))
    starts = _take(lib, starts_p, k, np.int64, (k,))
    spans = _take(lib, spans_p, k, np.int64, (k,))
    return perm, starts, spans
