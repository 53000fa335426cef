"""ctypes binding for the native TM-score extension (native/tmalign).

Builds the shared library on first use if g++ is available; callers that
want a guaranteed-pure-python path should use
`metrics.tm_score_fixed_alignment` directly (`metrics.calc_tm_score`
falls back automatically).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "tmalign", "tmalign.cc")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libtmalign.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build_library(force: bool = False) -> str:
    """Compiles the extension; returns the .so path."""
    if os.path.exists(_LIB_PATH) and not force:
        if not force and os.path.exists(_SRC) and os.path.getmtime(
            _SRC
        ) <= os.path.getmtime(_LIB_PATH):
            return _LIB_PATH
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            path = build_library()
            lib = ctypes.CDLL(path)
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            lib.tm_score_pair.argtypes = [
                f32p, ctypes.c_int, f32p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ]
            lib.tm_score_pair.restype = None
            lib.aligned_rmsd.argtypes = [f32p, f32p, ctypes.c_int]
            lib.aligned_rmsd.restype = ctypes.c_double
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.tm_align_pair.argtypes = [
                f32p, ctypes.c_int, f32p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                i32p,
            ]
            lib.tm_align_pair.restype = None
            _lib = lib
    return _lib


def tm_score_pair(pos_1: np.ndarray, pos_2: np.ndarray) -> Tuple[float, float]:
    """(tm normalized by len(pos_1), tm normalized by len(pos_2))."""
    lib = _load()
    a = np.ascontiguousarray(pos_1, dtype=np.float32)
    b = np.ascontiguousarray(pos_2, dtype=np.float32)
    t1 = ctypes.c_double()
    t2 = ctypes.c_double()
    lib.tm_score_pair(a, len(a), b, len(b), ctypes.byref(t1), ctypes.byref(t2))
    return t1.value, t2.value


def tm_align_pair(
    pos_1: np.ndarray, pos_2: np.ndarray, return_alignment: bool = False
):
    """Sequence-independent TM-align (Zhang & Skolnick 2005).

    Unlike `tm_score_pair` (identity alignment, the scTM setting), this
    searches over residue correspondences — the operation the reference's
    tmtools performs (`analysis/metrics.py:44-46`) and the one required for
    diversity clustering between chains of different lengths.

    Returns (tm normalized by len(pos_1), tm normalized by len(pos_2)),
    plus the per-residue alignment (len(pos_1) int array, -1 = gap) when
    return_alignment is set.
    """
    lib = _load()
    a = np.ascontiguousarray(pos_1, dtype=np.float32)
    b = np.ascontiguousarray(pos_2, dtype=np.float32)
    t1 = ctypes.c_double()
    t2 = ctypes.c_double()
    ali = np.full(len(a), -1, dtype=np.int32)
    lib.tm_align_pair(a, len(a), b, len(b), ctypes.byref(t1),
                      ctypes.byref(t2), ali)
    if return_alignment:
        return t1.value, t2.value, ali
    return t1.value, t2.value


def aligned_rmsd(pos_1: np.ndarray, pos_2: np.ndarray) -> float:
    lib = _load()
    n = min(len(pos_1), len(pos_2))
    a = np.ascontiguousarray(pos_1[:n], dtype=np.float32)
    b = np.ascontiguousarray(pos_2[:n], dtype=np.float32)
    return lib.aligned_rmsd(a, b, n)
