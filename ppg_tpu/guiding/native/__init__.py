"""ctypes loader for the native SD-tree host kernels (compiled on first use)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libppgsdt.so")
_SRC = os.path.join(_DIR, "sdtree_host.cpp")
_lock = threading.Lock()
_lib = None


def _compile():
    cmd = [
        os.environ.get("CXX", "c++"), "-O3", "-march=native", "-shared",
        "-fPIC", "-std=c++17", _SRC, "-o", _SO + ".tmp",
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
        i64 = ctypes.c_int64
        f64 = ctypes.c_double
        f64p = ctypes.POINTER(f64)
        i64p = ctypes.POINTER(i64)
        lib.ppg_sdt_reset.restype = i64
        lib.ppg_sdt_reset.argtypes = [i64, f64p, i64p, f64p, i64p, f64, i64, i64]
        lib.ppg_sdt_reset_copy.restype = None
        lib.ppg_sdt_reset_copy.argtypes = [i64p, i64p]
        lib.ppg_sdt_build.restype = None
        lib.ppg_sdt_build.argtypes = [i64, i64, f64p, i64p, i64p, i64p, f64p, i64p]
        lib.ppg_sdt_pushdown.restype = None
        lib.ppg_sdt_pushdown.argtypes = [i64, f64p, i64p]
        lib.ppg_sdt_regather.restype = None
        lib.ppg_sdt_regather.argtypes = [
            i64, i64p, i64p, i64p, f64p, i64p, i64p, f64p, i64p]
        _lib = lib
        return lib
