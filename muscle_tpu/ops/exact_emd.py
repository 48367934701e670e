"""Exact EMD via the native transportation-simplex solver.

Replaces the reference's qpth-QP (src/loss_multilabel.py:113-170) and
cv2.EMD (:172-199) exact backends.  Used for validating the Sinkhorn
training path, not inside jit.
"""

from __future__ import annotations

import ctypes

import numpy as np

from muscle_tpu.ops.native_lib import load


def exact_emd(
    cost: np.ndarray, weight1: np.ndarray, weight2: np.ndarray, return_flow: bool = False
):
    """cost: (N, M); weight1: (N,); weight2: (M,).  Marginals are
    relu+1e-5'd and normalised to equal mass (the reference's opencv-path
    preprocessing).  Returns cost or (cost, flow)."""
    lib = load()
    cost = np.ascontiguousarray(cost, np.float32)
    w1 = np.ascontiguousarray(weight1, np.float32)
    w2 = np.ascontiguousarray(weight2, np.float32)
    n, m = cost.shape
    flow = np.zeros((n, m), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    val = lib.muscle_exact_emd(
        cost.ctypes.data_as(f32p),
        w1.ctypes.data_as(f32p),
        w2.ctypes.data_as(f32p),
        n, m,
        flow.ctypes.data_as(f32p),
    )
    if return_flow:
        return float(val), flow
    return float(val)
