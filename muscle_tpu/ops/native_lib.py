"""ctypes loader for the native C++ library (builds on demand with g++)."""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


@functools.lru_cache(maxsize=1)
def load() -> ctypes.CDLL:
    native = os.path.abspath(_NATIVE_DIR)
    so = os.path.join(native, "libmuscle_native.so")
    srcs = [os.path.join(native, f) for f in ("densecrf.cpp", "exact_emd.cpp")]
    if not os.path.exists(so) or any(
        os.path.getmtime(s) > os.path.getmtime(so) for s in srcs
    ):
        subprocess.run(["make", "-C", native], check=True, capture_output=True)
    lib = ctypes.CDLL(so)

    f32p = ctypes.POINTER(ctypes.c_float)
    lib.muscle_dense_crf.argtypes = [
        f32p, ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, f32p,
    ]
    lib.muscle_dense_crf.restype = None

    lib.muscle_exact_emd.argtypes = [
        f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, f32p,
    ]
    lib.muscle_exact_emd.restype = ctypes.c_float
    return lib
