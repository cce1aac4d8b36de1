"""Build + load the native host library (g++ -O3, cached by mtime)."""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "solver.cpp"
_LIB = _DIR / "libmonst3r_native.so"

_lib = None


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_solver():
    """Returns the ctypes lib with solve_spd_f64, building if stale."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    lib.solve_spd_f64.restype = ctypes.c_int64
    lib.solve_spd_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_double,
    ]
    _lib = lib
    return lib


def solve_spd(A: np.ndarray, b: np.ndarray, jitter: float = 0.0) -> np.ndarray:
    """Solve SPD A x = b in float64 via the native library."""
    lib = load_solver()
    A = np.ascontiguousarray(A, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    n = A.shape[0]
    assert A.shape == (n, n) and b.shape == (n,)
    x = np.zeros(n, np.float64)
    rc = lib.solve_spd_f64(
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        jitter,
    )
    if rc != 0:
        raise np.linalg.LinAlgError("native SPD solve failed")
    return x
