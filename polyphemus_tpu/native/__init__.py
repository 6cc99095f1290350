"""Native (C++) host-runtime components, bound via ctypes.

Compiled on first use with g++ into a per-user cache; importers must handle
`load_fastloader()` returning None (toolchain missing) and fall back to the
numpy path.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "fastloader.cpp")
_lib = None
_lib_tried = False


def _cache_dir() -> str:
    d = os.environ.get("POLY_NATIVE_CACHE",
                       os.path.expanduser("~/.cache/polyphemus_native"))
    os.makedirs(d, exist_ok=True)
    return d


def load_fastloader() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the fastloader shared library, or None."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so_path = os.path.join(_cache_dir(), f"fastloader_{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                 _SRC, "-o", tmp],
                check=True, capture_output=True)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.poly_gather_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
        ]
        lib.poly_gather_batch.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib
