"""Small metric helpers (reference accuracy(), infer_mcl.py:44-60)."""

from __future__ import annotations

import numpy as np


def topk_accuracy(scores: np.ndarray, target: np.ndarray, topk=(1, 5)) -> list[float]:
    """Multi-label top-k hit rates: for each sample, whether any of the
    top-k scored classes is a ground-truth class.

    scores: (N, C); target: (N, C) multi-hot.  Returns [top1, topk] rates.
    """
    maxk = max(topk)
    order = np.argsort(-scores, axis=1)[:, :maxk]
    hits = np.take_along_axis(target, order, axis=1) > 0  # (N, maxk)
    top1 = float(hits[:, 0].mean())
    topk_rate = float(hits.any(axis=1).mean())
    return [top1, topk_rate]
