"""ctypes binding for the native C++ Riccati reference solver.

Builds ``native/riccati_ref.cpp`` on first use (cached ``.so``), exposing
:func:`riccati_solve_native` with the same (xs, us, vs, lams) contract as
``gar.solve``. See the C++ file header for its role (independent oracle +
CPU MPC fallback).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_SRC = _ROOT / "native" / "riccati_ref.cpp"
_SO = _ROOT / "native" / "libriccati_ref.so"

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                str(_SRC), "-o", str(_SO),
            ],
            check=True,
        )
    lib = ctypes.CDLL(str(_SO))
    dp = ctypes.POINTER(ctypes.c_double)
    lib.proximal_riccati_solve.restype = ctypes.c_int
    lib.proximal_riccati_solve.argtypes = (
        [ctypes.c_int] * 4 + [dp] * 14 + [ctypes.c_double] * 2 + [dp] * 4
    )
    _lib = lib
    return lib


def riccati_solve_native(problem, mudyn: float, mueq: float):
    """Solve an LQRProblem with the native C++ reference implementation.

    Requires ``nc0 == nx`` (state-dimension initial constraint). Runs in
    float64 on the host; returns numpy arrays (xs, us, vs, lams).
    """
    lib = _load()
    kn = problem.knots
    N = problem.horizon
    nx, nu, nc = kn.nx, kn.nu, kn.nc
    if problem.nc0 != nx:
        raise ValueError("native solver requires nc0 == nx")
    T = N + 1

    def arr(a, shape):
        out = np.ascontiguousarray(np.asarray(a, dtype=np.float64)).reshape(shape)
        return out

    Q = arr(kn.Q, (T, nx, nx)); S = arr(kn.S, (T, nx, nu))
    R = arr(kn.R, (T, nu, nu)); q = arr(kn.q, (T, nx)); r = arr(kn.r, (T, nu))
    A = arr(kn.A, (T, nx, nx)); B = arr(kn.B, (T, nx, nu))
    E = arr(kn.E, (T, nx, nx)); f = arr(kn.f, (T, nx))
    C = arr(kn.C, (T, nc, nx)); D = arr(kn.D, (T, nc, nu)); d = arr(kn.d, (T, nc))
    G0 = arr(problem.G0, (nx, nx)); g0 = arr(problem.g0, (nx,))

    xs = np.zeros((T, nx)); us = np.zeros((T, nu))
    vs = np.zeros((T, nc)); lams = np.zeros((T, nx))

    dp = ctypes.POINTER(ctypes.c_double)

    def P(a):
        return a.ctypes.data_as(dp)

    ret = lib.proximal_riccati_solve(
        N, nx, nu, nc, P(Q), P(S), P(R), P(q), P(r), P(A), P(B), P(E), P(f),
        P(C), P(D), P(d), P(G0), P(g0),
        ctypes.c_double(mudyn), ctypes.c_double(mueq),
        P(xs), P(us), P(vs), P(lams),
    )
    if ret != 0:
        raise RuntimeError(f"native riccati solve failed with code {ret}")
    return xs, us, vs, lams
