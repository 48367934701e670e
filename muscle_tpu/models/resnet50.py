"""ResNet-50 backbone for IRN (reference src/backbones/resnet50.py), Flax/NHWC.

The reference runs every BatchNorm in inference mode ("FixedBatchNorm",
resnet50.py:11-14) — running statistics are applied but never updated.  Here
that is simply a BatchNorm with ``use_running_average=True`` always.

Torch-style *symmetric* conv padding is used (explicit pad counts), NOT
TF-SAME — the two differ on even-sized inputs and the published IRN weights
were trained with torch semantics.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FixedBatchNorm(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn"
        )(x)


def _conv(features, kernel, stride=1, dilation=1, name=None, dtype=jnp.float32):
    pad = (kernel // 2) * dilation
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        out = _conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        out = nn.relu(FixedBatchNorm(self.dtype, name="bn1")(out))
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv2", dtype=self.dtype)(out)
        out = nn.relu(FixedBatchNorm(self.dtype, name="bn2")(out))
        out = _conv(self.planes * 4, 1, name="conv3", dtype=self.dtype)(out)
        out = FixedBatchNorm(self.dtype, name="bn3")(out)
        if self.has_downsample:
            residual = _conv(self.planes * 4, 1, self.stride, name="downsample_conv", dtype=self.dtype)(x)
            residual = FixedBatchNorm(self.dtype, name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNet50(nn.Module):
    """Returns the five stage outputs (x1..x5) used by the IRN heads."""

    strides: Sequence[int] = (2, 2, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        x = nn.Conv(
            64,
            (7, 7),
            strides=(self.strides[0], self.strides[0]),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.relu(FixedBatchNorm(self.dtype, name="bn1")(x))
        # MaxPool 3x3/2/pad1, torch semantics (pad with -inf).
        x1 = jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, 3, 3, 1),
            window_strides=(1, 2, 2, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)),
        )

        def stage(x, planes, blocks, stride, dilation, name):
            in_ch = x.shape[-1]
            x = Bottleneck(
                planes,
                stride,
                dilation=1,
                has_downsample=(stride != 1 or in_ch != planes * 4),
                dtype=self.dtype,
                name=f"{name}_0",
            )(x)
            for i in range(1, blocks):
                x = Bottleneck(planes, 1, dilation=dilation, dtype=self.dtype, name=f"{name}_{i}")(x)
            return x

        x2 = stage(x1, 64, 3, 1, self.dilations[0], "layer1")
        x3 = stage(x2, 128, 4, self.strides[1], self.dilations[1], "layer2")
        x4 = stage(x3, 256, 6, self.strides[2], self.dilations[2], "layer3")
        x5 = stage(x4, 512, 3, self.strides[3], self.dilations[3], "layer4")
        return [x1, x2, x3, x4, x5]
