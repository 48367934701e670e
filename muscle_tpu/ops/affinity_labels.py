"""Affinity label extraction for IRN training.

Re-statement of the reference's affinity-target machinery
(ExtractAffinityLabelInRadius, src/data.py:393-443 and
GetAffinityLabelFromIndices, src/data.py:611-637): for every pixel pair
(src, dst) enumerated by the PathIndex within radius, derive

  bg_pos: both pixels labelled background,
  fg_pos: both pixels share the same foreground class,
  neg:    pixels differ and neither is void (255).

Pairs touching void are ignored entirely.  Output shapes follow the
PathIndex pair layout ((D, P) direction-major), ready for the affinity
cross-entropy in muscle_tpu.training.irn.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from muscle_tpu.ops.random_walk import PathIndex


def get_indices_of_pairs(radius: int, size: tuple[int, int]):
    """Pairwise (from, to) flat-index arrays for all pixel pairs within
    ``radius`` on a grid (reference pyutils.get_indices_of_pairs,
    src/pyutils.py:137-176 capability; here derived from the PathIndex
    enumeration so the pair order matches the affinity machinery).

    Returns (indices_from (P,), indices_to (D, P)).
    """
    pi = PathIndex(radius, size)
    return pi.src_indices.copy(), pi.dst_indices.copy()


def _raster_pairs(offsets: np.ndarray, size: tuple[int, int],
                  from_slice: tuple[slice, slice]):
    """Shared core of the raster pair enumerations: ``indices_from`` is
    the cropped interior region (flattened raster order) and each offset
    (dy, dx) maps a source index i to i + dy*W + dx — the raster identity
    that replaces the reference's per-offset slice-and-flatten loop."""
    h, w = size
    full = np.arange(h * w, dtype=np.int64).reshape(h, w)
    indices_from = full[from_slice].reshape(-1)
    deltas = offsets[:, 0] * w + offsets[:, 1]
    indices_to = (indices_from[None, :] + deltas[:, None]).reshape(-1)
    return indices_from, indices_to


def get_indices_of_pairs_raster(radius: int, size: tuple[int, int],
                                orient: bool = False):
    """Reference pyutils.get_indices_of_pairs (src/pyutils.py:137-194):
    half-plane offset enumeration — (0, x) for x in [1, radius), then
    (y, x) for y in [1, radius) with y^2 + x^2 < radius^2 — over the
    top-cropped interior (rows [0, H-r+1), cols [r-1, W-r+1)).

    Returns (indices_from (P,), indices_to (D*P,)) and, with
    ``orient=True``, per-offset orientations quantised to 8 direction
    bins.  DEVIATION (documented, DEVIATIONS.md "dead/buggy"): the
    reference's quantisation masks test the boolean *flag* ``orient``
    instead of the ``orients`` array (src/pyutils.py:178-194), which
    collapses every offset to bin 0; this function quantises the actual
    angles.  The function is dead code in the reference scripts."""
    offs = [(0, x) for x in range(1, radius)]
    offs += [
        (y, x)
        for y in range(1, radius)
        for x in range(-radius + 1, radius)
        if x * x + y * y < radius * radius
    ]
    offsets = np.asarray(offs, np.int64)
    rf = radius - 1
    indices_from, indices_to = _raster_pairs(
        offsets, size, (slice(0, size[0] - rf), slice(rf, size[1] - rf))
    )
    if not orient:
        return indices_from, indices_to
    ang = np.arctan2(offsets[:, 0].astype(np.float64),
                     offsets[:, 1].astype(np.float64))
    div = 3.1416 / 8
    # bins 0..6 cover [div, 3div), [3div, 5div), ... [-3div, -div);
    # bin 3 additionally wraps the +/-pi seam; bin 7 is [-div, div).
    bins = np.full(ang.shape, 7, np.float64)
    for b, (lo, hi) in enumerate(
        [(1, 3), (3, 5), (5, 7)]  # upper half-plane
    ):
        bins[(ang >= lo * div) & (ang < hi * div)] = b
    bins[((ang >= 7 * div) & (ang < 8 * div))
         | ((ang >= -8 * div) & (ang < -7 * div))] = 3
    for b, (lo, hi) in enumerate([(-7, -5), (-5, -3), (-3, -1)], start=4):
        bins[(ang >= lo * div) & (ang < hi * div)] = b
    return indices_from, indices_to, bins


def get_indices_of_pairs_circle(radius: int, size: tuple[int, int]):
    """Reference pyutils.get_indices_of_pairs_circle
    (src/pyutils.py:196-228): the FULL punctured disc of offsets (both
    half-planes) over the centre-cropped interior (rows and cols
    [r-1, dim-r+1)).  Returns (indices_from (P,), indices_to (D*P,))."""
    offsets = np.asarray(
        [
            (y, x)
            for y in range(-radius + 1, radius)
            for x in range(-radius + 1, radius)
            if 0 < x * x + y * y < radius * radius
        ],
        np.int64,
    )
    rf = radius - 1
    return _raster_pairs(
        offsets, size,
        (slice(rf, size[0] - rf), slice(rf, size[1] - rf)),
    )


def affinity_labels_from_indices(
    label_flat: jax.Array, path_index: PathIndex
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """label_flat: (V,) int labels over the padded grid (255 = void; pad
    should be filled with 255 so padded pairs are ignored).

    Returns (bg_pos, fg_pos, neg) float masks of shape (D, P).
    """
    src = jnp.asarray(
        np.broadcast_to(
            path_index.src_indices[None, :], path_index.dst_indices.shape
        )
    )
    dst = jnp.asarray(path_index.dst_indices)
    a = label_flat[src]
    b = label_flat[dst]
    valid = (a != 255) & (b != 255)
    equal = (a == b) & valid
    bg_pos = (equal & (a == 0)).astype(jnp.float32)
    fg_pos = (equal & (a > 0)).astype(jnp.float32)
    neg = ((a != b) & valid).astype(jnp.float32)
    return bg_pos, fg_pos, neg
