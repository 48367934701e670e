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

Window-exact padded-canvas mode (``windows`` argument): every conv here is
1x1 (pointwise), so padded-canvas pollution can only enter through the two
spatial ops — the align_corners=True upsamples (reference src/MuSCLe.py:
47-54) and the avg_pool(3, 2, pad=1) downsamples (:51, 54).  Given per-level
valid windows, the upsamples become per-image window resizes
(core.resize.batched_window_resize_ac), the pools per-image window pools
(batched_window_avgpool_s2, count_include_pad semantics), and features are
re-zeroed outside their windows after every conv (the mids' swish(bias) and
the out/lateral BNs otherwise paint the pad region non-zero).  The canvas
forward then equals the reference's unpadded forward — the seg-path
counterpart of the round-3 backbone window mode (DEVIATIONS.md #8).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from muscle_tpu.core.resize import (
    avg_pool_3x3_s2,
    batched_window_avgpool_s2,
    batched_window_resize_ac,
    resize_to,
)


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
    def __call__(self, feats, train: bool = False, windows=None, masks=None):
        p3, p4, p5, p6, p7 = feats
        cat = lambda a, b: jnp.concatenate([a, b], axis=-1)  # noqa: E731
        mid = lambda name: ConvBNSwish(self.channels, use_bn=False, dtype=self.dtype, name=name)  # noqa: E731
        out = lambda name: ConvBNSwish(self.channels, use_bn=True, dtype=self.dtype, name=name)  # noqa: E731

        if windows is None:
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

        # ---- window-exact mode (see module docstring) ----------------------
        w3, w4, w5, w6, w7 = windows
        m3, m4, m5, m6, m7 = masks
        hw = lambda p: (p.shape[1], p.shape[2])  # noqa: E731

        p6_mid = mid("convp67")(cat(p6, p7), train) * m6
        up65 = batched_window_resize_ac(p6_mid, w6, w5, hw(p5))
        p5_mid = mid("convp56")(cat(p5, up65), train) * m5
        p4_mid = mid("convp45")(cat(p4, p5), train) * m4
        up43 = batched_window_resize_ac(p4_mid, w4, w3, hw(p3))
        p3_out = mid("convp34")(cat(p3, up43), train) * m3

        pool3, pw3 = batched_window_avgpool_s2(p3_out, w3, hw(p4))
        p4_out = out("out4")(
            p4 + p4_mid + batched_window_resize_ac(pool3, pw3, w4, hw(p4)), train
        ) * m4
        p5_out = out("out5")(p5 + p5_mid + p4_out, train) * m5
        if self.last_pooling:
            pool5, pw5 = batched_window_avgpool_s2(p5_out, w5, hw(p6))
            p6_out = out("out6")(
                p6 + p6_mid + batched_window_resize_ac(pool5, pw5, w6, hw(p6)),
                train,
            ) * m6
        else:
            p6_out = out("out6")(p6 + p6_mid + p5_out, train) * m6
        p7_out = out("out7")(p7 + p6_out, train) * m7
        return [p3_out, p4_out, p5_out, p6_out, p7_out]


class BiFPN(nn.Module):
    """Lateral 1x1+BN+swish projections then N stacked BiFPN layers
    (reference src/MuSCLe.py:115-148).  ``windows``: optional per-level
    (N, 4) valid windows — the window-exact padded-canvas mode (see module
    docstring)."""

    channels: int = 256
    num_layers: int = 3
    last_pooling: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False, windows=None):
        p3, p4, p5, p6, p7 = feats
        masks = None
        if windows is not None:
            from muscle_tpu.models.efficientnet import window_mask

            masks = [
                window_mask((p.shape[1], p.shape[2]), w, p.dtype)
                for p, w in zip(feats, windows)
            ]
        proj = lambda name, x: ConvBNSwish(self.channels, dtype=self.dtype, name=name)(x, train)  # noqa: E731
        feats = [
            proj("inp3", p3),
            proj("inp4", p4),
            proj("inp5", p5),
            proj("inp6", p6),
            proj("inp7", p7),
        ]
        if masks is not None:
            feats = [f * m for f, m in zip(feats, masks)]
        for i in range(self.num_layers):
            feats = BiFPNLayer(
                self.channels, self.last_pooling, dtype=self.dtype, name=f"layer_{i}"
            )(feats, train, windows=windows, masks=masks)
        return feats
