"""CAM normalisers.

Pure jnp re-statements of the normalisers the reference re-defines in four
places (reference: train_mcl.py:21-36, infer_mcl.py:27-42,
train_muscle.py:22-29, src/MuSCLe.py:202-211).  The +-1e-6 epsilons are kept
bit-for-bit because downstream background thresholds were tuned against them.

Layout note: this package is channels-last (NHWC) end to end — the natural
layout for TPUs.  CAM stacks are therefore (N, H, W, C) with C = num_classes
(channel 0 = background where a bg channel exists).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def _minmax_norm(cams: jax.Array) -> jax.Array:
    """ReLU then per-(sample, class) min-max normalisation over space."""
    cams = jax.nn.relu(cams)
    cam_min = jnp.min(cams, axis=(1, 2), keepdims=True)
    cam_max = jnp.max(cams, axis=(1, 2), keepdims=True)
    return (cams - cam_min - _EPS) / (cam_max - cam_min + _EPS)


def cam_maxnorm(cams: jax.Array) -> jax.Array:
    """Per-class min-max normalisation (reference train_mcl.py:21-28).

    Args:
      cams: (N, H, W, C) raw CAM scores.
    Returns:
      (N, H, W, C) in [0, 1) with negatives clamped to 0.
    """
    return jax.nn.relu(_minmax_norm(cams))


def cam_maxnorm_with_bg(cams: jax.Array) -> jax.Array:
    """Min-max normalise then re-derive the background channel
    (reference src/MuSCLe.py:202-211).

    Channel 0 is replaced by 1 - max(foreground).
    """
    norm = _minmax_norm(cams)
    fg = norm[..., 1:]
    bg = 1.0 - jnp.max(fg, axis=-1, keepdims=True)
    return jax.nn.relu(jnp.concatenate([bg, fg], axis=-1))


def cam_softmaxnorm(cams: jax.Array, relu_first: bool = False) -> jax.Array:
    """Softmax-normalise foreground channels; bg = 1 - max(foreground).

    The training scripts call this without the leading ReLU
    (reference train_mcl.py:30-36); the CAM inference script applies ReLU
    first (reference infer_mcl.py:36-42) — select with ``relu_first``.
    """
    if relu_first:
        cams = jax.nn.relu(cams)
    fg = jax.nn.softmax(cams[..., 1:], axis=-1)
    bg = 1.0 - jnp.max(fg, axis=-1, keepdims=True)
    return jnp.concatenate([bg, fg], axis=-1)


def gap2d(x: jax.Array, keepdims: bool = False) -> jax.Array:
    """Global average pool over the spatial axes of NHWC (reference
    src/torchutils.py:293-298)."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def gap2d_pos(x: jax.Array, keepdims: bool = False) -> jax.Array:
    """Sum over space divided by the global positive count (reference
    src/torchutils.py:300-304, quirk included: the denominator counts
    positives over the whole batch tensor, not per channel)."""
    out = jnp.sum(x, axis=(1, 2), keepdims=keepdims)
    return out / (jnp.sum(x > 0) + 1e-12)


def attach_bg_channel(label: jax.Array, value: float = 1.0) -> jax.Array:
    """Prepend a constant background score to a multi-hot label.

    Mirrors the ``label_with_bg`` idiom repeated in every reference script
    (e.g. train_mcl.py:167-170): (N, 20) -> (N, 21) with channel 0 == value.
    """
    bg = jnp.full(label.shape[:-1] + (1,), value, dtype=label.dtype)
    return jnp.concatenate([bg, label], axis=-1)
