"""ctypes binding for the C++/OpenMP threshold-sweep kernels.

Builds ``csrc/sweep.cpp`` on first use with g++ (-O3 -march=native -fopenmp)
into the package directory and memoizes the handle. Replaces the reference's
joblib Parallel / multiprocessing.Pool sweep hosts (EE/thresh.py:218-225,
EE/large_scale.py:148,206) with a zero-copy shared-memory kernel.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "sweep.cpp")
_LIB_PATH = os.path.join(_HERE, "_sweep.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _LIB_PATH, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.mixture_sweep.argtypes = [
            f32p, f32p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            f32p, f32p,
        ]
        lib.mixture_sweep.restype = None
        lib.global_sweep.argtypes = [
            f32p, f32p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            f32p, f32p,
        ]
        lib.global_sweep.restype = None
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def mixture_sweep(
    scores: np.ndarray, correct: np.ndarray, mixtures: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(accuracy, average_exit) per mixture.

    scores (E,N) CSF matrix; correct (E,N) per-exit correctness; mixtures
    (M,E) per-exit thresholds.
    """
    lib = _load()
    scores = np.ascontiguousarray(scores, np.float32)
    correct = np.ascontiguousarray(correct, np.float32)
    mixtures = np.ascontiguousarray(mixtures, np.float32)
    E, N = scores.shape
    M = mixtures.shape[0]
    assert mixtures.shape[1] == E and correct.shape == (E, N)
    acc = np.empty(M, np.float32)
    avg = np.empty(M, np.float32)
    lib.mixture_sweep(scores, correct, mixtures, E, N, M, acc, avg)
    return acc, avg


def global_sweep(
    scores: np.ndarray, correct: np.ndarray, thresholds: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(accuracy, average_exit) per scalar threshold; no-pass samples take
    the final exit (the global-thresholding policy rule)."""
    lib = _load()
    scores = np.ascontiguousarray(scores, np.float32)
    correct = np.ascontiguousarray(correct, np.float32)
    thresholds = np.ascontiguousarray(thresholds, np.float32)
    E, N = scores.shape
    T = len(thresholds)
    acc = np.empty(T, np.float32)
    avg = np.empty(T, np.float32)
    lib.global_sweep(scores, correct, thresholds, E, N, T, acc, avg)
    return acc, avg
