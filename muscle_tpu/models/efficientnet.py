"""EfficientNet backbone (b0-b8) in Flax, NHWC, TPU-first.

Capability parity with the reference backbone
(src/efficientnet_pytorch/model.py, utils.py) re-designed for XLA:

* channels-last layout (NHWC) — the native TPU convolution layout;
* TF-style SAME padding via XLA's ``padding='SAME'`` (exactly the asymmetric
  scheme the reference reimplements in Conv2dDynamicSamePadding,
  utils.py:103-119);
* swish is plain ``jax.nn.silu`` — the reference's custom-autograd
  "MemoryEfficientSwish" (utils.py:36-52) is a torch memory workaround that
  XLA's fusion/remat makes unnecessary;
* drop-connect (stochastic depth, utils.py:82-91) with the same
  floor(keep_prob + U[0,1)) Bernoulli construction;
* ``extract_features`` returns EVERY block output (the full 26/55-deep
  pyramid, model.py:171-188) because MuSCLe indexes arbitrary blocks;
* the ``last_pooling`` architecture fork (utils.py:252-274): stage 6 stride
  2 (seg mode, strides ...16,32,32) vs stride 1 (CAM mode, ...16,16,16).

Block widths/depths follow the official compound-scaling rules
(round_filters/round_repeats, utils.py:59-79) so the published
adv-efficientnet checkpoints convert 1:1 (see muscle_tpu.convert).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BlockArgs:
    kernel_size: int
    num_repeat: int
    input_filters: int
    output_filters: int
    expand_ratio: int
    stride: int
    se_ratio: float | None = 0.25
    id_skip: bool = True


# Stage table shared by every variant before compound scaling
# (reference utils.py:256-274). ``last_pooling`` toggles stage 6's stride.
_BASE_STAGES = (
    BlockArgs(3, 1, 32, 16, 1, 1),
    BlockArgs(3, 2, 16, 24, 6, 2),
    BlockArgs(5, 2, 24, 40, 6, 2),
    BlockArgs(3, 3, 40, 80, 6, 2),
    BlockArgs(5, 3, 80, 112, 6, 1),
    BlockArgs(5, 4, 112, 192, 6, 2),  # stride -> 1 when last_pooling=False
    BlockArgs(3, 1, 192, 320, 6, 1),
)

# width, depth, resolution, dropout (reference utils.py:161-174)
_SCALING = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
    "efficientnet-b8": (2.2, 3.6, 672, 0.5),
}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """Compound width scaling (reference utils.py:59-71)."""
    if not width:
        return filters
    filters *= width
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth: float) -> int:
    """Compound depth scaling (reference utils.py:74-79)."""
    if not depth:
        return repeats
    return int(math.ceil(depth * repeats))


def efficientnet_config(
    model_name: str, last_pooling: bool = True
) -> tuple[tuple[BlockArgs, ...], float]:
    """Expand the stage table into one BlockArgs per block (flattened, the
    way the reference builds its ``_blocks`` ModuleList, model.py:134-150).

    Returns (per-block args, drop_connect_rate).
    """
    width, depth, _, _ = _SCALING[model_name]
    blocks: list[BlockArgs] = []
    for stage_idx, stage in enumerate(_BASE_STAGES):
        stride = stage.stride
        if stage_idx == 5 and not last_pooling:
            stride = 1
        inp = round_filters(stage.input_filters, width)
        outp = round_filters(stage.output_filters, width)
        repeats = round_repeats(stage.num_repeat, depth)
        blocks.append(dataclasses.replace(stage, input_filters=inp, output_filters=outp, stride=stride))
        for _ in range(repeats - 1):
            blocks.append(
                dataclasses.replace(stage, input_filters=outp, output_filters=outp, stride=1)
            )
    return tuple(blocks), 0.2


def drop_connect(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    """Per-sample stochastic depth (reference utils.py:82-91)."""
    keep = 1.0 - rate
    mask = jnp.floor(
        keep + jax.random.uniform(rng, (x.shape[0], 1, 1, 1), dtype=x.dtype)
    )
    return x / keep * mask


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck (reference model.py:17-98).

    expand 1x1 -> BN -> swish -> depthwise kxk -> BN -> swish ->
    squeeze-excite -> project 1x1 -> BN -> (+ identity w/ drop-connect).

    The whole block is elementwise+conv chained, which XLA fuses into a few
    MXU convolutions with the BN/activations folded into their epilogues —
    the TPU equivalent of the "fused MBConv" people hand-write in CUDA.
    """

    args: BlockArgs
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        drop_rate: float = 0.0,
    ) -> jax.Array:
        a = self.args
        inputs = x
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            name=name,
        )

        oup = a.input_filters * a.expand_ratio
        if a.expand_ratio != 1:
            x = nn.Conv(oup, (1, 1), padding="SAME", use_bias=False, dtype=self.dtype, name="_expand_conv")(x)
            x = nn.silu(bn("_bn0")(x))

        x = nn.Conv(
            oup,
            (a.kernel_size, a.kernel_size),
            strides=(a.stride, a.stride),
            padding="SAME",
            use_bias=False,
            feature_group_count=oup,
            dtype=self.dtype,
            name="_depthwise_conv",
        )(x)
        x = nn.silu(bn("_bn1")(x))

        if a.se_ratio is not None and 0 < a.se_ratio <= 1:
            squeezed = max(1, int(a.input_filters * a.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = nn.Conv(squeezed, (1, 1), dtype=self.dtype, name="_se_reduce")(se)
            se = nn.Conv(oup, (1, 1), dtype=self.dtype, name="_se_expand")(nn.silu(se))
            x = jax.nn.sigmoid(se) * x

        x = nn.Conv(
            a.output_filters, (1, 1), padding="SAME", use_bias=False, dtype=self.dtype, name="_project_conv"
        )(x)
        x = bn("_bn2")(x)

        if a.id_skip and a.stride == 1 and a.input_filters == a.output_filters:
            if train and drop_rate > 0.0:
                x = drop_connect(x, drop_rate, self.make_rng("dropout"))
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """EfficientNet feature-pyramid extractor.

    ``__call__`` returns the list of all per-block outputs, mirroring the
    reference ``extract_features`` (model.py:171-188; the conv head is dead
    code there and is likewise omitted here).
    """

    model_name: str = "efficientnet-b3"
    last_pooling: bool = True
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        blocks, drop_connect_rate = efficientnet_config(self.model_name, self.last_pooling)
        width = _SCALING[self.model_name][0]

        stem = round_filters(32, width)
        x = nn.Conv(
            stem, (3, 3), strides=(2, 2), padding="SAME", use_bias=False, dtype=self.dtype, name="_conv_stem"
        )(x)
        x = nn.silu(
            nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                dtype=self.dtype,
                name="_bn0",
            )(x)
        )

        pyramid = []
        n_blocks = len(blocks)
        for idx, args in enumerate(blocks):
            rate = drop_connect_rate * idx / n_blocks
            x = MBConvBlock(
                args,
                bn_momentum=self.bn_momentum,
                bn_epsilon=self.bn_epsilon,
                dtype=self.dtype,
                name=f"_blocks_{idx}",
            )(x, train=train, drop_rate=rate)
            pyramid.append(x)
        return pyramid
