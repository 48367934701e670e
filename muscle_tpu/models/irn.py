"""IRN (Inter-pixel Relation Network) edge/displacement heads, Flax/NHWC.

Re-design of reference src/backbones/resnet50_irn.py: a frozen ResNet-50
feeds two heads — a class-boundary edge map and a 2-channel displacement
field.  ``EdgeDisplacement`` is the inference wrapper used by the random-walk
CAM refinement stage (infer_irn.py:40-66): it pads the (orig, flip) pair to a
fixed crop, runs the net once, and fuses ``sigmoid(e0/2 + flip(e1)/2)``.

The fixed 512x512 pad is TPU-friendly — a single static shape for the whole
dataset, so one compiled program serves every image.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from muscle_tpu.core.resize import resize_bilinear
from muscle_tpu.models.resnet50 import ResNet50


def _upsample(x: jax.Array, factor: int) -> jax.Array:
    n, h, w, c = x.shape
    return resize_bilinear(x, (h * factor, w * factor), align_corners=False)


class _ConvGN(nn.Module):
    features: int
    groups: int
    upsample: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype, name="gn")(x)
        if self.upsample > 1:
            x = _upsample(x, self.upsample)
        return nn.relu(x)


class IRNNet(nn.Module):
    """Backbone + edge & displacement branches (reference resnet50_irn.py:6-132)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        stages = ResNet50(strides=(2, 2, 2, 1), dtype=self.dtype, name="resnet50")(x)
        # Backbone is frozen during IRN training (reference :110-114).
        x1, x2, x3, x4, x5 = [jax.lax.stop_gradient(s) for s in stages]

        e1 = _ConvGN(32, 4, dtype=self.dtype, name="fc_edge1")(x1)
        e2 = _ConvGN(32, 4, dtype=self.dtype, name="fc_edge2")(x2)
        e3 = _ConvGN(32, 4, upsample=2, dtype=self.dtype, name="fc_edge3")(x3)[
            :, : e2.shape[1], : e2.shape[2]
        ]
        e4 = _ConvGN(32, 4, upsample=4, dtype=self.dtype, name="fc_edge4")(x4)[
            :, : e2.shape[1], : e2.shape[2]
        ]
        e5 = _ConvGN(32, 4, upsample=4, dtype=self.dtype, name="fc_edge5")(x5)[
            :, : e2.shape[1], : e2.shape[2]
        ]
        edge_out = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype, name="fc_edge6")(
            jnp.concatenate([e1, e2, e3, e4, e5], axis=-1)
        )

        d1 = _ConvGN(64, 8, dtype=self.dtype, name="fc_dp1")(x1)
        d2 = _ConvGN(128, 16, dtype=self.dtype, name="fc_dp2")(x2)
        d3 = _ConvGN(256, 16, dtype=self.dtype, name="fc_dp3")(x3)
        d4 = _ConvGN(256, 16, upsample=2, dtype=self.dtype, name="fc_dp4")(x4)[
            :, : d3.shape[1], : d3.shape[2]
        ]
        d5 = _ConvGN(256, 16, upsample=2, dtype=self.dtype, name="fc_dp5")(x5)[
            :, : d3.shape[1], : d3.shape[2]
        ]
        d_up3 = _ConvGN(256, 16, upsample=2, dtype=self.dtype, name="fc_dp6")(
            jnp.concatenate([d3, d4, d5], axis=-1)
        )[:, : d2.shape[1], : d2.shape[2]]
        dp = _ConvGN(256, 16, dtype=self.dtype, name="fc_dp7_pre")(
            jnp.concatenate([d1, d2, d_up3], axis=-1)
        )
        dp_out = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype, name="fc_dp7_out")(dp)
        # MeanShift (inference): subtract the running mean buffer
        # (reference :98-107).
        mean = self.variable(
            "batch_stats", "mean_shift", lambda: jnp.zeros((2,), self.dtype)
        )
        dp_out = dp_out - mean.value.reshape(1, 1, 1, 2)
        return edge_out, dp_out


class EdgeDisplacement(nn.Module):
    """Inference wrapper fusing an (orig, flip) pair (reference :215-232)."""

    crop_size: int = 512
    stride: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, valid_hw: jax.Array | None = None):
        """x: (2, H, W, 3) — image and its horizontal flip.

        Returns (edge, dp): edge (h', w'), dp (2, h', w') with
        h' = (H-1)//stride + 1.

        ``valid_hw``: optional (2,) dynamic valid (h, w) when the pair is
        top-left-placed inside a larger static canvas (the batched pipeline
        pads to ``crop_size`` once instead of per-image).  The flipped
        branch is then un-flipped within the valid *feature* width — the
        reference achieves the same by cropping to feat_size before the
        flip (resnet50_irn.py:227-229).
        """
        _, hh, ww, _ = x.shape
        feat_h = (hh - 1) // self.stride + 1
        feat_w = (ww - 1) // self.stride + 1
        x = jnp.pad(x, ((0, 0), (0, self.crop_size - hh), (0, self.crop_size - ww), (0, 0)))
        edge_out, dp_out = IRNNet(dtype=self.dtype, name="net")(x)
        edge_out = edge_out[:, :feat_h, :feat_w, 0]
        dp_out = dp_out[:, :feat_h, :feat_w, :]
        if valid_hw is None:
            flipped = edge_out[1, :, ::-1]
        else:
            ew = (valid_hw[1] - 1) // self.stride + 1
            cols = jnp.arange(feat_w)
            src = jnp.clip(ew - 1 - cols, 0, feat_w - 1)
            flipped = jnp.take(edge_out[1], src, axis=1)
        edge = jax.nn.sigmoid(edge_out[0] / 2 + flipped / 2)
        dp = jnp.moveaxis(dp_out[0], -1, 0)
        return edge, dp
