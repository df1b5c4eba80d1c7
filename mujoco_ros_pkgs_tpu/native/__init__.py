"""Native (C++) runtime components, loaded over ctypes (no pybind11).

Compiled on demand with the system toolchain and cached next to the sources;
every consumer has a pure-python fallback so the framework degrades gracefully
on machines without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIBS = {}


def _build(name: str) -> str:
    src = os.path.join(_HERE, f"{name}.cpp")
    out = os.path.join(_HERE, f"lib{name}.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               src, "-o", out + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(out + ".tmp", out)
    return out


def load(name: str):
    """Load (building if needed) a native library; None if unavailable."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        try:
            lib = ctypes.CDLL(_build(name))
        except Exception:
            lib = None
        _LIBS[name] = lib
        return lib


def statecodec():
    lib = load("statecodec")
    if lib is None:
        return None
    lib.codec_blob_size.restype = ctypes.c_uint64
    lib.codec_blob_size.argtypes = [ctypes.POINTER(ctypes.c_uint64),
                                    ctypes.c_uint32]
    lib.codec_pack.restype = ctypes.c_uint64
    lib.codec_pack.argtypes = [ctypes.POINTER(ctypes.c_void_p),
                               ctypes.POINTER(ctypes.c_uint64),
                               ctypes.c_uint32, ctypes.c_char_p,
                               ctypes.c_uint64]
    lib.codec_unpack.restype = ctypes.c_uint32
    lib.codec_unpack.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                 ctypes.POINTER(ctypes.c_void_p),
                                 ctypes.POINTER(ctypes.c_uint64),
                                 ctypes.c_uint32]
    return lib
