"""Spare building blocks for API parity (reference src/MuSCLe.py:60-113:
SELayer, SeparableConvBlock — defined there but off the main path)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class SELayer(nn.Module):
    """Squeeze-excite with dense reduce/expand (reference :60-75)."""

    reduction: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(nn.relu(y))
        return x * jax.nn.sigmoid(y)[:, None, None, :]


class SeparableConvBlock(nn.Module):
    """Depthwise 3x3 (no bias) + pointwise 1x1 (bias) + optional BN
    (reference :77-113; torch momentum 0.01 -> flax momentum 0.99)."""

    features: int | None = None
    norm: bool = True
    activation: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        out = self.features or c
        x = nn.Conv(
            c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
            use_bias=False, dtype=self.dtype, name="depthwise",
        )(x)
        x = nn.Conv(out, (1, 1), use_bias=True, dtype=self.dtype, name="pointwise")(x)
        if self.norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name="bn",
            )(x)
        if self.activation:
            x = nn.silu(x)
        return x
