"""Exact dense-CRF (native permutohedral lattice, CPU).

Drop-in for the reference's pydensecrf call (src/imutils.py:439-456):
``dense_crf(img, probs, t)`` with the same defaults and argument layout
(probs channel-first).  Used for verifying the XLA mean-field path and as
the bit-faithful post-processing backend.
"""

from __future__ import annotations

import ctypes

import numpy as np

from muscle_tpu.ops.native_lib import load


def dense_crf(
    img: np.ndarray,
    probs: np.ndarray,
    t: int = 2,
    scale_factor: float = 1.5,
    labels: int = 21,
    confidence: float = 0.5,
) -> np.ndarray:
    """img: (H, W, 3) uint8; probs: (L, H, W) softmax scores.
    Returns (L, H, W) refined distribution."""
    lib = load()
    h, w = img.shape[:2]
    l = probs.shape[0]
    probs = np.ascontiguousarray(probs, np.float32)
    img_c = np.ascontiguousarray(img[..., :3], np.uint8)
    out = np.empty_like(probs)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.muscle_dense_crf(
        probs.ctypes.data_as(f32p),
        img_c.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w, l, t,
        3.0 / scale_factor, 1.0,
        32.0 / scale_factor, 10.0, 10.0,
        confidence,
        out.ctypes.data_as(f32p),
    )
    return out
