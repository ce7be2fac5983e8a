"""Native (C++/OpenMP) runtime kernels, built on demand via g++ + ctypes.

The compute path on TPU is JAX/XLA; these kernels serve the host-side
runtime (plan execution on CPU, the role of block2's C++ BatchGEMM layer)
where Python/numpy overhead would otherwise dominate over millions of tiny
quantum-number blocks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_LIB = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "sandwich.cpp")
    so = os.path.join(here, "libsandwich.so")
    if not os.path.exists(so) or \
            os.path.getmtime(so) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
               "-fPIC", src, "-o", so]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.assemble_exec.restype = None
    lib.assemble_exec.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.sandwich_exec.restype = None
    lib.sandwich_exec.argtypes = [
        ctypes.c_int, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_and_load()
    return _LIB
