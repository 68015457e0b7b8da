"""ctypes binding + on-demand build of the native runtime library.

pybind11 is not available in the image, so the C++ runtime exposes a plain
C ABI and Python talks to it through ctypes. The library is compiled on
first use (g++ -O3, a few hundred ms) and cached next to the source; every
entry point has a pure-Python fallback so the framework works without a
toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "tpujoints_native.cpp")
_LIB = os.path.join(_HERE, "libtpujoints.so")
_HASH = _LIB + ".srchash"
_ABI = 1

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _stale() -> bool:
    """A binary is trusted only if it was built from THIS source on THIS
    machine: staleness keys on a source-content hash recorded at build time
    (mtime comparison fails on fresh checkouts, where both files share a
    timestamp), and nothing prebuilt ships in the repo."""
    if not os.path.exists(_LIB) or not os.path.exists(_HASH):
        return True
    try:
        with open(_HASH) as f:
            return f.read().strip() != _src_hash()
    except OSError:
        return True


def _build() -> bool:
    # No -march=native: the artifact must not SIGILL if the filesystem moves
    # to a different microarchitecture; nothing here is SIMD-bound anyway.
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        with open(_HASH, "w") as f:
            f.write(_src_hash())
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.tj_abi_version.restype = ctypes.c_int
    lib.tj_free.argtypes = [ctypes.c_void_p]
    lib.tj_load_pcd.restype = ctypes.c_int
    lib.tj_load_pcd.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.tj_ingest.restype = ctypes.c_long
    lib.tj_ingest.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.tj_depth_to_cloud.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it if needed; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if _stale():
            if not _build():
                return None
        try:
            lib = _bind(ctypes.CDLL(_LIB))
            if lib.tj_abi_version() != _ABI:
                return None
            _lib = lib
        except OSError:
            return None
        return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_pcd_native(path: str) -> Optional[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """(xyz[N,3], rgb[N,3] or None), or None if the lib can't parse it."""
    lib = get_lib()
    if lib is None:
        return None
    xyz_p = ctypes.POINTER(ctypes.c_float)()
    rgb_p = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long()
    rc = lib.tj_load_pcd(path.encode(), ctypes.byref(xyz_p),
                         ctypes.byref(rgb_p), ctypes.byref(n))
    if rc != 0:
        return None
    try:
        npts = n.value
        xyz = np.ctypeslib.as_array(xyz_p, shape=(npts, 3)).copy()
        rgb = (np.ctypeslib.as_array(rgb_p, shape=(npts, 3)).copy()
               if rgb_p else None)
    finally:
        lib.tj_free(xyz_p)
        if rgb_p:
            lib.tj_free(rgb_p)
    return xyz, rgb


def ingest_native(
    xyz: np.ndarray, capacity: int, sentinel: float = 1.0e6
) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """NaN filter + even-stride subsample + sentinel pad, in C++.

    Returns (padded [capacity,3], mask [capacity] bool, n_valid) or None.
    """
    lib = get_lib()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32).reshape(-1, 3)
    out = np.empty((capacity, 3), np.float32)
    mask = np.empty(capacity, np.uint8)
    n = lib.tj_ingest(_fptr(xyz), xyz.shape[0], capacity,
                      ctypes.c_float(sentinel), _fptr(out),
                      mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, mask.astype(bool), int(n)


def depth_to_cloud_native(
    depth: np.ndarray, fov_deg: float = 57.0, near: float = 0.0,
    far: float = 0.0,
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    depth = np.ascontiguousarray(depth, np.float32)
    h, w = depth.shape
    out = np.empty((h, w, 3), np.float32)
    lib.tj_depth_to_cloud(_fptr(depth), h, w, ctypes.c_float(fov_deg),
                          ctypes.c_float(near), ctypes.c_float(far), _fptr(out))
    return out
