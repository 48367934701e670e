"""BiFPN decoder (reference src/MuSCLe.py:30-58, 115-148), Flax/NHWC.

Faithful to the reference's (slightly idiosyncratic) fusion topology:

  p6_mid = conv1x1(cat[p6, p7])
  p5_mid = conv1x1(cat[p5, up(p6_mid)])
  p4_mid = conv1x1(cat[p4, p5])            # yes: p5, not p5_mid
  p3_out = conv1x1(cat[p3, up(p4_mid)])
  p4_out = out4(p4 + p4_mid + up(avgpool3x3s2(p3_out)))
  p5_out = out5(p5 + p5_mid + p4_out)
  p6_out = out6(p6 + p6_mid + [pool path if last_pooling else p5_out])
  p7_out = out7(p7 + p6_out)

Mid convs are 1x1+swish; lateral/out convs are 1x1+BN+swish.  The BiFPN BNs
use torch defaults (eps 1e-5, update factor 0.1) unlike the EfficientNet BNs
(1e-3 / 0.01) — preserved here for checkpoint parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from muscle_tpu.core.resize import avg_pool_3x3_s2, resize_to


class ConvBNSwish(nn.Module):
    features: int
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        return nn.silu(x)


class BiFPNLayer(nn.Module):
    channels: int = 256
    last_pooling: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        p3, p4, p5, p6, p7 = feats
        cat = lambda a, b: jnp.concatenate([a, b], axis=-1)  # noqa: E731
        mid = lambda name: ConvBNSwish(self.channels, use_bn=False, dtype=self.dtype, name=name)  # noqa: E731
        out = lambda name: ConvBNSwish(self.channels, use_bn=True, dtype=self.dtype, name=name)  # noqa: E731

        p6_mid = mid("convp67")(cat(p6, p7), train)
        p5_mid = mid("convp56")(cat(p5, resize_to(p6_mid, p5)), train)
        p4_mid = mid("convp45")(cat(p4, p5), train)
        p3_out = mid("convp34")(cat(p3, resize_to(p4_mid, p3)), train)

        p4_out = out("out4")(p4 + p4_mid + resize_to(avg_pool_3x3_s2(p3_out), p4), train)
        p5_out = out("out5")(p5 + p5_mid + p4_out, train)
        if self.last_pooling:
            p6_out = out("out6")(p6 + p6_mid + resize_to(avg_pool_3x3_s2(p5_out), p6), train)
        else:
            p6_out = out("out6")(p6 + p6_mid + p5_out, train)
        p7_out = out("out7")(p7 + p6_out, train)
        return [p3_out, p4_out, p5_out, p6_out, p7_out]


class BiFPN(nn.Module):
    """Lateral 1x1+BN+swish projections then N stacked BiFPN layers
    (reference src/MuSCLe.py:115-148)."""

    channels: int = 256
    num_layers: int = 3
    last_pooling: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        p3, p4, p5, p6, p7 = feats
        proj = lambda name, x: ConvBNSwish(self.channels, dtype=self.dtype, name=name)(x, train)  # noqa: E731
        feats = [
            proj("inp3", p3),
            proj("inp4", p4),
            proj("inp5", p5),
            proj("inp6", p6),
            proj("inp7", p7),
        ]
        for i in range(self.num_layers):
            feats = BiFPNLayer(
                self.channels, self.last_pooling, dtype=self.dtype, name=f"layer_{i}"
            )(feats, train)
        return feats
