"""Support utilities around the BEACON loss (reference src/edge.py support
classes: BGFilter :13-23, Edge_detector :443-467, UnitVec :91-121,
FieldGenerator :125-173, ArgMax :386-403, Mix_fg :405-440).

These are off the main training path in the reference but part of its API
surface; kept as pure jnp functions.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from muscle_tpu.core.sobel import sobel_edges
from muscle_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

_E = 1e-6


def box_filter(x: jax.Array, kernel_size: int = 3) -> jax.Array:
    """Mean box filter on an (N, H, W, 1) map (reference BGFilter)."""
    pad = kernel_size // 2
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return summed / (kernel_size * kernel_size)


def _gaussian_kernel_2d(size: int, sigma: float | None) -> np.ndarray:
    if sigma is None:
        sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8  # torchvision default
    ax = np.arange(size) - (size - 1) / 2.0
    k1 = np.exp(-(ax**2) / (2 * sigma**2))
    k1 /= k1.sum()
    return np.outer(k1, k1).astype(np.float32)


def grayscale_edge(
    x: jax.Array, gaussian_size: int = 7, gaussian_sigma: float | None = None,
    sobel_size: int = 3,
) -> jax.Array:
    """Gaussian-blur grayscale Sobel edge magnitude of a normalised image
    batch (reference Edge_detector): denormalise, blur, ITU-R grayscale,
    Sobel magnitude.  x: (N, H, W, 3) color_norm'd.  Returns (N, H, W, 1).
    """
    mean = jnp.asarray(IMAGENET_MEAN[0, 0], x.dtype)
    std = jnp.asarray(IMAGENET_STD[0, 0], x.dtype)
    img = jnp.clip((x * std + mean) * 255.0, 0.0, 255.0)
    k = jnp.asarray(_gaussian_kernel_2d(gaussian_size, gaussian_sigma))
    pad = gaussian_size // 2
    kern = jnp.zeros((gaussian_size, gaussian_size, 3, 3), x.dtype)
    kern = kern.at[:, :, jnp.arange(3), jnp.arange(3)].set(k[:, :, None])
    blurred = jax.lax.conv_general_dilated(
        img, kern, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    gray = (
        0.2989 * blurred[..., 0] + 0.587 * blurred[..., 1] + 0.114 * blurred[..., 2]
    )[..., None] / 255.0
    return sobel_edges(gray, sobel_size, orient=False)


def unit_vectors(orient: jax.Array) -> jax.Array:
    """8-direction unit vectors for orientation bins (reference UnitVec).
    orient: int array of bins in [0, 8) -> (..., 2) unit vectors."""
    u = 1.0 / math.sqrt(2.0)
    table = jnp.asarray(
        [
            [u, u], [_E, u], [-u, u], [-u, _E],
            [-u, -u], [_E, -u], [u, -u], [u, _E],
        ],
        jnp.float32,
    )
    return table[orient]


def field_masks(orient: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """5x5 inside/outside half-plane masks per orientation bin (reference
    FieldGenerator): returns (outs, out_idx, ins, in_idx) with trailing
    25-dim mask axes."""
    k = [None] * 8
    k[0] = np.where(np.triu(np.ones((5, 5)), 1) > 0, 1.0, _E)
    k[1] = np.where(np.arange(5)[:, None] < 2, 1.0, _E) * np.ones((5, 5))
    k[2] = np.where(np.fliplr(np.triu(np.ones((5, 5)), 1)) > 0, 1.0, _E)
    k[3] = np.where(np.arange(5)[None, :] < 2, 1.0, _E) * np.ones((5, 5))
    k[4] = np.where(np.tril(np.ones((5, 5)), -1) > 0, 1.0, _E)
    k[5] = np.where(np.arange(5)[:, None] > 2, 1.0, _E) * np.ones((5, 5))
    k[6] = np.where(np.fliplr(np.tril(np.ones((5, 5)), -1)) > 0, 1.0, _E)
    k[7] = np.where(np.arange(5)[None, :] > 2, 1.0, _E) * np.ones((5, 5))
    outs_table = jnp.asarray(np.stack([x.reshape(-1) for x in k]), jnp.float32)
    ins_table = jnp.roll(outs_table, 4, axis=0)
    outs = outs_table[orient]
    ins = ins_table[orient]
    return outs, outs > 1e-5, ins, ins > 1e-5


@jax.custom_vjp
def straight_through_argmax(x: jax.Array) -> jax.Array:
    """argmax over the last axis with a straight-through gradient
    (reference ArgMax autograd fn; the torch version scatters the summed
    upstream gradient onto the argmax index)."""
    return jnp.argmax(x, axis=-1).astype(x.dtype)


def _sta_fwd(x):
    idx = jnp.argmax(x, axis=-1)
    onehot = jax.nn.one_hot(idx, x.shape[-1], dtype=x.dtype)
    return idx.astype(x.dtype), onehot


def _sta_bwd(onehot, g):
    # torch version scatters the SUMMED upstream gradient onto the argmax
    # position (edge.py:398-403)
    return (onehot * jnp.sum(g),)


straight_through_argmax.defvjp(_sta_fwd, _sta_bwd)
