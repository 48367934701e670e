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
