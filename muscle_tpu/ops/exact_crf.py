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


def dense_crf_seam(
    img: np.ndarray, probs: np.ndarray, t: int = 10, scale_factor: float = 1.0,
) -> np.ndarray:
    """SEAM-parameter variant (reference crf_inference_seam,
    src/imutils.py:458-475): gaussian sxy 3 compat 3, bilateral sxy 80
    srgb 13 compat 10, unnormalised-softmax unary."""
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
        3.0 / scale_factor, 3.0,
        80.0 / scale_factor, 13.0, 10.0,
        1.0,  # confidence 1 -> unary = -log(probs) exactly
        out.ctypes.data_as(f32p),
    )
    return out


def dense_crf_label(
    img: np.ndarray, labels: np.ndarray, t: int = 10, n_labels: int = 21,
    gt_prob: float = 0.7,
) -> np.ndarray:
    """Hard-label variant (reference crf_inference_label,
    src/imutils.py:477-491): unary_from_labels + gaussian(3,3) +
    bilateral(50,5,10), returns the refined argmax labels."""
    lib = load()
    h, w = img.shape[:2]
    p = np.full((n_labels, h, w), (1.0 - gt_prob) / (n_labels - 1), np.float32)
    rows, cols = np.indices((h, w))
    p[labels.astype(np.int64), rows, cols] = gt_prob
    img_c = np.ascontiguousarray(img[..., :3], np.uint8)
    out = np.empty_like(p)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.muscle_dense_crf(
        p.ctypes.data_as(f32p),
        img_c.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w, n_labels, t,
        3.0, 3.0, 50.0, 5.0, 10.0,
        1.0,
        out.ctypes.data_as(f32p),
    )
    return np.argmax(out, axis=0)
