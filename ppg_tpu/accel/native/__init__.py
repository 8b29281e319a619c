"""ctypes loader for the native BVH builder (compiled on first use)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libppgbvh.so")
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_lock = threading.Lock()
_lib = None


def _compile():
    cmd = [
        os.environ.get("CXX", "c++"), "-O3", "-march=native", "-shared",
        "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _SO + ".tmp",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)


def get_lib():
    """Returns the loaded library, or None if the toolchain is missing."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib or None
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _compile()
            lib = ctypes.CDLL(_SO)
        except Exception:
            _lib = False
            return None
        i32 = ctypes.c_int32
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(i32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ppg_bvh_build.restype = i32
        lib.ppg_bvh_build.argtypes = [f32p, i32, i32p, i32, i32, i32]
        lib.ppg_bvh_copy.restype = None
        lib.ppg_bvh_copy.argtypes = [f32p, f32p, u8p, i32p, i32p, i32p, i32p]
        lib.ppg_bvhw_build.restype = i32
        lib.ppg_bvhw_build.argtypes = [f32p, i32, i32p, i32, i32, i32, i32]
        lib.ppg_bvhw_copy.restype = None
        lib.ppg_bvhw_copy.argtypes = [f32p, i32p]
        _lib = lib
        return lib
