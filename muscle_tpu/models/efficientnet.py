"""EfficientNet backbone (b0-b8) in Flax, NHWC, TPU-first.

Capability parity with the reference backbone
(src/efficientnet_pytorch/model.py, utils.py) re-designed for XLA:

* channels-last layout (NHWC) — the native TPU convolution layout;
* stride-1 convs use XLA's ``padding='SAME'`` (== the reference's TF-SAME
  for stride 1 at every size); stride-2 convs use the reference's STATIC
  pads (utils.py:122-146): Conv2dStaticSamePadding computes its pad ONCE
  from ``global_params.image_size`` (a constant per variant, always even:
  224-672) and applies it at every runtime size, so the operative
  semantics is "even-input TF-SAME pads unconditionally" — total k-2,
  split ((k-2)//2, rest).  For even inputs this equals dynamic SAME; for
  odd inputs it pads one less on the left and produces the FLOOR size
  chain (25 -> 12 -> 6 -> 3), which dynamic SAME does not (-> 13).  Real
  VOC sides (375x500) are odd, so matching this is required for trained-
  weight parity (round-4 gate-1 '_trained' bisect: deltas appeared
  exactly on odd-dim scales and vanished on even-chain sizes);
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


def _static_pad(kernel_size: int):
    """The reference's stride-2 pad amounts (Conv2dStaticSamePadding,
    utils.py:122-146, image_size constant & even per variant): total
    k - 2, split low-first — k3 -> ((0, 1), (0, 1)), k5 -> ((1, 2), (1, 2)).
    Equals XLA's dynamic SAME on even inputs; the reference semantics
    (floor size chain) on odd inputs."""
    lo = (kernel_size - 2) // 2
    hi = kernel_size - 2 - lo
    return ((lo, hi), (lo, hi))


def advance_window(win):
    """Valid-window transform across one static-pad stride-2 conv.

    ``win``: (..., 4) int (oy, ox, h, w) — the image's valid window inside
    the padded canvas at the conv's INPUT resolution.  The reference's
    static pads (see _static_pad) are size-independent, so a window placed
    at an EVEN offset stays stride-grid aligned and the output window is
    simply the floor transform (oy//2, ox//2, h//2, w//2): the right/
    bottom zeros the reference's pad supplies are the canvas zeros outside
    the window, and the k5 left zero coincides with the canvas conv's own
    left pad column.  placement_offset() keeps every offset at 0, which is
    even at every level.  Works on numpy and jax arrays.
    """
    new = [win[..., 0] // 2, win[..., 1] // 2, win[..., 2] // 2, win[..., 3] // 2]
    if isinstance(win, jax.Array):
        return jnp.stack(new, axis=-1)
    import numpy as np

    return np.stack(new, axis=-1)


def placement_offset(sizes, n_strided: int):
    """Per-image canvas placement (oy, ox) such that the valid window stays
    stride-grid aligned through ``n_strided`` static-pad stride-2 convs.

    With the reference's size-independent static pads (_static_pad) every
    conv's window grid starts at the image origin, so offset 0 is aligned
    at every level and this is identically zero.  (Under dynamic TF-SAME
    this used to be the parity ladder O = sum_j q_j * 2^j; kept as a
    function because every engine routes placement through it, and so the
    signature documents the alignment requirement.)  Works on numpy and
    jax arrays.
    """
    zero = sizes[..., 0] * 0
    if isinstance(sizes, jax.Array):
        return jnp.stack([zero, zero], axis=-1)
    import numpy as np

    return np.stack([zero, zero], axis=-1)


def window_mask(hw: tuple[int, int], win: jax.Array, dtype) -> jax.Array:
    """(N, H, W, 1) indicator of the per-image valid windows ``win``
    ((N, 4) int (oy, ox, h, w)) inside an (H, W) canvas."""
    rows = jnp.arange(hw[0])[None, :, None]
    cols = jnp.arange(hw[1])[None, None, :]
    oy = win[:, 0][:, None, None]
    ox = win[:, 1][:, None, None]
    m = (
        (rows >= oy)
        & (rows < oy + win[:, 2][:, None, None])
        & (cols >= ox)
        & (cols < ox + win[:, 3][:, None, None])
    )
    return m[..., None].astype(dtype)


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
        mask_in: jax.Array | None = None,
        mask_out: jax.Array | None = None,
        se_count: jax.Array | None = None,
        fused: bool = False,
        window: jax.Array | None = None,
    ) -> jax.Array:
        """mask_in/mask_out: optional (N, H, W, 1) valid-window indicators at
        the block's input/output resolution (padded-canvas exact mode).  The
        reference runs every image unpadded, so its convs read TF-SAME zeros
        beyond the image; re-zeroing before the depthwise conv and after
        every BN (whose shift makes the pad region nonzero) plus a masked SE
        mean (``se_count`` = per-image valid pixel count, (N, 1, 1, 1))
        makes this canvas forward bit-equal to the unpadded one
        (STATUS.md backlog #1 "HALO").

        fused: run the whole block as one Pallas kernel
        (ops/pallas/mbconv.py).  OPT-IN and currently slower than the XLA
        lowering on v5e (see that module's measured outcome); only taken
        for eligible stride-1 blocks outside init.  ``window`` is the
        (N, 4) valid-window scalar form of the masks (no mask tensors
        cross HBM)."""
        a = self.args
        if (
            fused
            and not train
            and not self.is_initializing()
            and a.stride == 1
            # the kernel takes the residual iff Cin == Cout; exclude the
            # (table-absent) id_skip=False Cin==Cout case it can't express
            and (a.id_skip or a.input_filters != a.output_filters)
            and a.se_ratio
        ):
            from muscle_tpu.ops.pallas.mbconv import (
                fused_fits_vmem,
                fused_mbconv_stride1,
            )

            fused = fused_fits_vmem(
                x.shape[1], x.shape[2], a.input_filters,
                a.input_filters * a.expand_ratio, a.output_filters,
                a.kernel_size, self.dtype,
            )
        else:
            fused = False
        if fused:

            v = self.variables
            return fused_mbconv_stride1(
                x, v["params"], v["batch_stats"], window,
                k=a.kernel_size, has_expand=a.expand_ratio != 1,
                se_ratio_filters=max(1, int(a.input_filters * a.se_ratio)),
                bn_eps=self.bn_epsilon,
                compute_dtype=self.dtype,
            )
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
            if mask_in is not None:
                x = x * mask_in  # zeros under the depthwise kernel's halo

        x = nn.Conv(
            oup,
            (a.kernel_size, a.kernel_size),
            strides=(a.stride, a.stride),
            # stride 2: the reference's size-independent static pads
            # (_static_pad); == SAME on even inputs, floor chain on odd
            padding="SAME" if a.stride == 1 else _static_pad(a.kernel_size),
            use_bias=False,
            feature_group_count=oup,
            dtype=self.dtype,
            name="_depthwise_conv",
        )(x)
        x = nn.silu(bn("_bn1")(x))
        if mask_out is not None:
            x = x * mask_out

        if a.se_ratio is not None and 0 < a.se_ratio <= 1:
            squeezed = max(1, int(a.input_filters * a.se_ratio))
            if se_count is None:
                se = jnp.mean(x, axis=(1, 2), keepdims=True)
            else:
                # masked mean == the reference's unpadded adaptive_avg_pool
                # (x is already zero outside the window)
                se = jnp.sum(x, axis=(1, 2), keepdims=True) / se_count
            se = nn.Conv(squeezed, (1, 1), dtype=self.dtype, name="_se_reduce")(se)
            se = nn.Conv(oup, (1, 1), dtype=self.dtype, name="_se_expand")(nn.silu(se))
            x = jax.nn.sigmoid(se) * x

        x = nn.Conv(
            a.output_filters, (1, 1), padding="SAME", use_bias=False, dtype=self.dtype, name="_project_conv"
        )(x)
        x = bn("_bn2")(x)
        if mask_out is not None:
            x = x * mask_out

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

    fuse_max_in_filters: int = 0  # fuse stride-1 MBConvs with input_filters
    # <= this many channels as Pallas kernels at inference (0 disables;
    # OPT-IN — measured slower than XLA on v5e, see ops/pallas/mbconv.py)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        valid_window: jax.Array | None = None,
    ) -> list[jax.Array]:
        """valid_window: optional (N, 4) int (oy, ox, h, w) per-image valid
        windows inside the padded input canvas, with (oy, ox) chosen by
        placement_offset().  When given, features are re-zeroed to the
        per-stage window after every BN (and SE pools over the window only),
        which makes the padded-canvas forward EQUAL to the reference's
        unpadded TF-SAME forward (utils.py:103-145) — see MBConvBlock."""
        blocks, drop_connect_rate = efficientnet_config(self.model_name, self.last_pooling)
        width = _SCALING[self.model_name][0]

        stem = round_filters(32, width)
        x = nn.Conv(
            stem, (3, 3), strides=(2, 2), padding=_static_pad(3),
            use_bias=False, dtype=self.dtype, name="_conv_stem"
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
        win = mask = count = None
        if valid_window is not None:
            win = advance_window(valid_window)  # stem is stride 2
            mask = window_mask(x.shape[1:3], win, x.dtype)
            count = (win[:, 2] * win[:, 3]).astype(x.dtype)[:, None, None, None]
            x = x * mask

        pyramid = []
        n_blocks = len(blocks)
        for idx, args in enumerate(blocks):
            rate = drop_connect_rate * idx / n_blocks
            mask_in = mask
            if win is not None and args.stride == 2:
                win = advance_window(win)
                mask = window_mask(
                    ((x.shape[1] + 1) // 2, (x.shape[2] + 1) // 2), win, x.dtype
                )
                count = (win[:, 2] * win[:, 3]).astype(x.dtype)[:, None, None, None]
            x = MBConvBlock(
                args,
                bn_momentum=self.bn_momentum,
                bn_epsilon=self.bn_epsilon,
                dtype=self.dtype,
                name=f"_blocks_{idx}",
            )(x, train=train, drop_rate=rate, mask_in=mask_in, mask_out=mask,
              se_count=count,
              fused=args.input_filters <= self.fuse_max_in_filters,
              window=win)
            pyramid.append(x)
        return pyramid
