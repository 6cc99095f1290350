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

_HERE = os.path.dirname(__file__)
_libs: dict = {}


def _cache_dir() -> str:
    d = os.environ.get("POLY_NATIVE_CACHE",
                       os.path.expanduser("~/.cache/polyphemus_native"))
    os.makedirs(d, exist_ok=True)
    return d


def _build(src_name: str) -> Optional[ctypes.CDLL]:
    """Compile (once, content-hashed) and load a native source, or None."""
    if src_name in _libs:
        return _libs[src_name]
    lib = None
    try:
        src = os.path.join(_HERE, src_name)
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        stem = os.path.splitext(src_name)[0]
        so_path = os.path.join(_cache_dir(), f"{stem}_{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                 src, "-o", tmp],
                check=True, capture_output=True)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
    except Exception:
        lib = None
    _libs[src_name] = lib
    return lib


def load_fastloader() -> Optional[ctypes.CDLL]:
    lib = _build("fastloader.cpp")
    if lib is not None and not hasattr(lib.poly_gather_batch, "_typed"):
        lib.poly_gather_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
        ]
        lib.poly_gather_batch.restype = None
        lib.poly_gather_batch._typed = True
    return lib


def load_midirender() -> Optional[ctypes.CDLL]:
    lib = _build("midirender.cpp")
    if lib is not None and not hasattr(lib.poly_render_midi, "_typed"):
        c = ctypes
        lib.poly_render_midi.argtypes = [
            c.POINTER(c.c_int32), c.POINTER(c.c_uint8),
            c.c_int32, c.c_int32, c.c_int32, c.c_int32,
            c.POINTER(c.c_int32), c.POINTER(c.c_uint8),
            c.POINTER(c.c_int32), c.c_int32, c.c_int32, c.c_int32,
            c.POINTER(c.c_uint8), c.c_int64,
        ]
        lib.poly_render_midi.restype = ctypes.c_int64
        lib.poly_render_midi._typed = True
    return lib
