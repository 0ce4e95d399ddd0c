"""ctypes bindings for the native FD-oracle kernels (fd_kernels.cc).

``backward_euler_sweep(off, diag, D, Dinv, psi_T, n_steps)`` runs the
whole psi time-marching loop in C++ with the tridiagonal factorization
hoisted out of the loop (the reference refactorizes per step via
scipy.linalg.solve_banded, problems.py:257-262).  Falls back to SciPy if
the shared library has not been built; ``build()`` compiles it with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpspde_fd.so")
_LIB = None


def build(force: bool = False) -> str:
    """Compile fd_kernels.cc into libpspde_fd.so (g++ -O3)."""
    src = os.path.join(_DIR, "fd_kernels.cc")
    if force or (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(src)):
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, src])
    return _SO


def _lib():
    global _LIB
    if _LIB is None:
        if not os.path.exists(_SO):
            build()
        lib = ctypes.CDLL(_SO)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.backward_euler_sweep.restype = ctypes.c_int
        lib.backward_euler_sweep.argtypes = [dp, dp, dp, dp,
                                             ctypes.c_int64, dp,
                                             ctypes.c_int64]
        lib.dense_solve.restype = ctypes.c_int
        lib.dense_solve.argtypes = [dp, dp, ctypes.c_int64]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def _as_c(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def backward_euler_sweep(off_scaled, diag_scaled, D, Dinv, psi_terminal,
                         n_steps: int) -> np.ndarray:
    """psi (n_steps+1, n) with psi[n_steps] = psi_terminal and
    psi[k] = D T^{-1} Dinv psi[k+1]."""
    n = len(diag_scaled)
    psi = np.zeros((n_steps + 1, n), dtype=np.float64)
    psi[n_steps] = psi_terminal
    off, diag = _as_c(off_scaled), _as_c(diag_scaled)
    Dc, Dinvc = _as_c(D), _as_c(Dinv)
    lib = _lib()
    dp = ctypes.POINTER(ctypes.c_double)
    rc = lib.backward_euler_sweep(
        off.ctypes.data_as(dp), diag.ctypes.data_as(dp),
        Dc.ctypes.data_as(dp), Dinvc.ctypes.data_as(dp),
        ctypes.c_int64(n), psi.ctypes.data_as(dp), ctypes.c_int64(n_steps))
    if rc != 0:
        raise RuntimeError("native backward_euler_sweep failed (zero pivot)")
    return psi


def dense_solve(A, b) -> np.ndarray:
    """Solve A x = b (dense, partial pivoting), native."""
    A = _as_c(A).copy()
    x = _as_c(b).copy()
    lib = _lib()
    dp = ctypes.POINTER(ctypes.c_double)
    rc = lib.dense_solve(A.ctypes.data_as(dp), x.ctypes.data_as(dp),
                         ctypes.c_int64(A.shape[0]))
    if rc != 0:
        raise RuntimeError("native dense_solve failed (singular matrix)")
    return x
