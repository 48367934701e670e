"""Sobel gradients and 8-direction orientation quantisation.

jnp re-statements of the fixed-kernel machinery behind the BEACON boundary
loss (reference src/edge.py:25-89).  The reference's curious 1e-6 entries in
place of zeros are preserved — they leak into gradient magnitudes and hence
into the >= 0.8*max boundary-pixel selection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_E = 1e-6


def sobel_kernel(kernel_size: int = 3) -> np.ndarray:
    """(kh, kw, 2) stacked Gx/Gy kernels (reference src/edge.py:33-43)."""
    if kernel_size == 3:
        gx = np.array([[1.0, _E, -1.0], [2.0, _E, -2.0], [1.0, _E, -1.0]])
        gy = np.array([[1.0, 2.0, 1.0], [_E, _E, _E], [-1.0, -2.0, -1.0]])
    elif kernel_size == 5:
        gx = np.array(
            [
                [2.0, 1.0, _E, -1.0, -2.0],
                [3.0, 2.0, _E, -2.0, -3.0],
                [4.0, 3.0, 0.0, -3.0, -4.0],
                [3.0, 2.0, _E, -2.0, -3.0],
                [2.0, 1.0, _E, -1.0, -2.0],
            ]
        )
        gy = np.array(
            [
                [2.0, 3.0, 4.0, 3.0, 2.0],
                [1.0, 2.0, 3.0, 2.0, 1.0],
                [_E, _E, _E, _E, _E],
                [-1.0, -2.0, -3.0, -2.0, -1.0],
                [-2.0, -3.0, -4.0, -3.0, -2.0],
            ]
        )
    else:
        raise ValueError(f"unsupported sobel kernel size {kernel_size}")
    return np.stack([gx, gy], axis=-1).astype(np.float32)


def sobel_edges(x: jax.Array, kernel_size: int = 3, orient: bool = True) -> jax.Array:
    """Apply the Sobel pair to a single-channel NHWC map.

    Args:
      x: (N, H, W, 1).
      orient: if True return the raw (N, H, W, 2) gradient field; otherwise
        the gradient magnitude sqrt(gx^2 + gy^2 + 1e-8) of shape (N, H, W, 1)
        (reference src/edge.py:45-53).
    """
    k = jnp.asarray(sobel_kernel(kernel_size), dtype=x.dtype)[:, :, None, :]
    pad = kernel_size // 2
    g = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if orient:
        return g
    mag = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True) + 1e-8)
    return mag


def orient_quantize(g: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Quantise a gradient field into magnitude + 8 direction bins.

    Args:
      g: (..., 2) gradient field, last axis = (gx, gy).
    Returns:
      mag: (...,) gradient magnitude sqrt(gx^2+gy^2+1e-8).
      orient: (...,) int32 in [0, 8) matching the mask layout of reference
        src/edge.py:72-88 (bin 0 = angles in [pi/8, 3pi/8), ... bin 7 =
        [-pi/8, pi/8)).
    """
    return orient_quantize_xy(g[..., 0], g[..., 1])


def orient_quantize_xy(gx: jax.Array, gy: jax.Array) -> tuple[jax.Array, jax.Array]:
    """orient_quantize on separate gx/gy arrays (avoids a 2-lane minor axis
    on large tensors — see losses/beacon.py memory note)."""
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-8)
    theta = jnp.arctan2(gy, gx)
    div = 3.1416 / 8
    # Shift so each pi/4 sector maps to one bin; the reference enumerates the
    # same partition with eight boolean masks.
    bins = jnp.full(theta.shape, 3, dtype=jnp.int32)  # default: the +-pi seam
    edges = [
        ((theta >= div) & (theta < 3 * div), 0),
        ((theta >= 3 * div) & (theta < 5 * div), 1),
        ((theta >= 5 * div) & (theta < 7 * div), 2),
        (((theta >= 7 * div) & (theta < 8 * div)) | ((theta >= -8 * div) & (theta < -7 * div)), 3),
        ((theta >= -7 * div) & (theta < -5 * div), 4),
        ((theta >= -5 * div) & (theta < -3 * div), 5),
        ((theta >= -3 * div) & (theta < -div), 6),
        ((theta >= -div) & (theta < div), 7),
    ]
    for mask, value in edges:
        bins = jnp.where(mask, value, bins)
    return mag, bins
