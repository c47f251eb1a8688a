"""Native (C++) runtime components.

The exact-pivot path of the framework (network simplex; later simplex basis
factors) has a C++ core built from native/netsimplex.cpp into
libscxnative.so, loaded via ctypes.  When the library is absent the pure
numpy implementations are used instead (same algorithms, same results).
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path

_LIB = None
_LOAD_ATTEMPTED = False


def _lib_path() -> Path:
    return Path(__file__).parent / "libscxnative.so"


def load_native():
    global _LIB, _LOAD_ATTEMPTED
    if _LOAD_ATTEMPTED:
        return _LIB
    _LOAD_ATTEMPTED = True
    p = _lib_path()
    if p.exists() and os.environ.get("SCX_DISABLE_NATIVE", "0") != "1":
        try:
            _LIB = ctypes.CDLL(str(p))
        except OSError:
            _LIB = None
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def native_network_simplex(mcf, warm_basis, max_iter, tol):
    from smart_crossover_tpu.native.netsimplex import solve as _solve

    return _solve(mcf, warm_basis, max_iter, tol)
