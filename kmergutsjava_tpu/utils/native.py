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


_SCAT_SRC = os.path.join(os.path.dirname(_SRC), "scatter.cpp")
_SCAT_SO = os.path.join(os.path.dirname(_SRC), "scatter.so")
_U16P = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")

_scat_lib = None
_scat_tried = False


def load_scatter() -> Optional[ctypes.CDLL]:
    """Native dense-tile scatter (native/scatter.cpp); None without g++."""
    global _scat_lib, _scat_tried
    with _lock:
        if _scat_lib is not None or _scat_tried:
            return _scat_lib
        _scat_tried = True
        if os.environ.get("KMER_NO_NATIVE_SCATTER"):
            return None
        try:
            if (not os.path.exists(_SCAT_SO)
                    or os.path.getmtime(_SCAT_SO)
                    < os.path.getmtime(_SCAT_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SCAT_SO,
                     _SCAT_SRC], check=True, capture_output=True)
            lib = ctypes.CDLL(_SCAT_SO)
            fn = lib.scatter_chunk
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                _I64P, ctypes.c_int64,                        # values, n
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,               # dims, fp_mod
                _U16P, _U8P,                                  # tiles, occ
                _I64P, _I64P, _I32P,                          # homes, flat, shift
            ]
            fn = lib.decode_hits
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                _I64P, _I64P, _I64P, _I64P, _I64P, _I32P,     # query columns
                ctypes.c_int64,                               # n
                _I32P, _U8P, _I64P,                           # out, fe, hk
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # hk_len, w, full_w
                _I32P, _I32P, _I32P, _F32P,                   # table columns
                _I64P, _I64P, _I32P, _I32P, _I32P, _F32P,     # hit columns out
                _I64P,                                        # hit values out
            ]
            _scat_lib = lib
        except Exception:
            _scat_lib = None
        return _scat_lib


_FASTA_SRC = os.path.join(os.path.dirname(_SRC), "fasta.cpp")
_FASTA_SO = os.path.join(os.path.dirname(_SRC), "fasta.so")

_fasta_lib = None
_fasta_tried = False


def load_fasta() -> Optional[ctypes.CDLL]:
    """Native bulk FASTA parser (native/fasta.cpp); None without g++."""
    global _fasta_lib, _fasta_tried
    with _lock:
        if _fasta_lib is not None or _fasta_tried:
            return _fasta_lib
        _fasta_tried = True
        if os.environ.get("KMER_NO_NATIVE_FASTA"):
            return None
        try:
            if (not os.path.exists(_FASTA_SO)
                    or os.path.getmtime(_FASTA_SO)
                    < os.path.getmtime(_FASTA_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _FASTA_SO,
                     _FASTA_SRC], check=True, capture_output=True)
            lib = ctypes.CDLL(_FASTA_SO)
            fn = lib.parse_fasta
            fn.restype = ctypes.c_int64
            fn.argtypes = [_U8P, ctypes.c_int64, _I64P, ctypes.c_int64,
                           _U8P, _I64P]
            _fasta_lib = lib
        except Exception:
            _fasta_lib = None
        return _fasta_lib


_GRP_SRC = os.path.join(os.path.dirname(_SRC), "grouping.cpp")
_GRP_SO = os.path.join(os.path.dirname(_SRC), "grouping.so")
_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

_grp_lib = None
_grp_tried = False


def load_grouping() -> Optional[ctypes.CDLL]:
    """Native batch grouping core (native/grouping.cpp); None without g++."""
    global _grp_lib, _grp_tried
    with _lock:
        if _grp_lib is not None or _grp_tried:
            return _grp_lib
        _grp_tried = True
        try:
            if (not os.path.exists(_GRP_SO)
                    or os.path.getmtime(_GRP_SO) < os.path.getmtime(_GRP_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _GRP_SO,
                     _GRP_SRC], check=True, capture_output=True)
            lib = ctypes.CDLL(_GRP_SO)
            fn = lib.group_batch
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                _I64P, _I32P, _I32P, _I32P, _F32P,           # hit columns
                _I64P, ctypes.c_int64,                        # bounds
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32,                               # params
                _I64P, _I64P, _I64P, _I32P, _I32P, _F32P,     # call records
                _I32P, _I32P, _I32P,                          # nupd + updates
                ctypes.c_int64, ctypes.c_int64,               # capacities
            ]
            _grp_lib = lib
        except Exception:
            _grp_lib = None
        return _grp_lib
