"""ctypes loader for the native feeder (native/feeder.cpp).

Builds the shared library on demand with g++ (cached beside the source);
returns None when no toolchain is available so callers can fall back to the
numpy feeder.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "feeder.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "feeder.so")

_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def load_feeder() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            for name in ("feeder_aa", "feeder_dna"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int64
                fn.argtypes = [_U8P, _I64P, _I64P, ctypes.c_int64, _I64P,
                               _U8P, _I64P, _I32P, _I32P]
            _lib = lib
        except Exception:
            _lib = None
        return _lib
