"""Fused MBConv Pallas kernel parity vs the Flax block (interpret mode).

The fused path must reproduce models/efficientnet.py MBConvBlock
(inference) to float tolerance — with and without the valid-window masks,
with and without the expand conv, k in {3, 5}.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from muscle_tpu.models.efficientnet import (
    BlockArgs,
    MBConvBlock,
    placement_offset,
    window_mask,
)
from muscle_tpu.ops.pallas.mbconv import fused_mbconv_stride1


def _run_pair(args: BlockArgs, h, w, window, seed=0):
    rng = np.random.default_rng(seed)
    block = MBConvBlock(args)
    x = rng.normal(size=(2, h, w, args.input_filters)).astype(np.float32) * 0.5
    variables = block.init({"params": jax.random.key(seed)}, jnp.asarray(x))
    # non-identity BN stats so the folding is actually exercised (positive
    # values serve as both plausible means and valid variances)
    bs = jax.tree.map(
        lambda a: jnp.asarray(
            np.abs(rng.normal(size=a.shape, scale=0.3)) + 0.2, a.dtype
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}

    if window is not None:
        mask_in = window_mask((h, w), window, jnp.float32)
        se_count = (window[:, 2] * window[:, 3]).astype(jnp.float32)[:, None, None, None]
        want = block.apply(
            variables, jnp.asarray(x), mask_in=mask_in, mask_out=mask_in,
            se_count=se_count,
        )
    else:
        want = block.apply(variables, jnp.asarray(x))

    got = fused_mbconv_stride1(
        jnp.asarray(x), variables["params"], variables["batch_stats"], window,
        k=args.kernel_size, has_expand=args.expand_ratio != 1,
        se_ratio_filters=max(1, int(args.input_filters * args.se_ratio)),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_mbconv_k3_expand():
    _run_pair(BlockArgs(3, 1, 24, 24, 6, 1), 24, 40, None)


def test_fused_mbconv_k5_expand():
    _run_pair(BlockArgs(5, 1, 32, 32, 6, 1), 19, 33, None, seed=1)


def test_fused_mbconv_no_expand():
    # stage-1 shape: expand_ratio 1, dw straight on the input
    _run_pair(BlockArgs(3, 1, 40, 40, 1, 1), 24, 24, None, seed=2)


def test_fused_mbconv_windowed():
    # padded-canvas exact mode: per-image windows at placement offsets
    sizes = np.array([[17, 29], [24, 40]], np.int32)
    off = placement_offset(sizes, 1)
    window = jnp.asarray(np.concatenate([off, sizes], axis=-1))
    _run_pair(BlockArgs(3, 1, 24, 24, 6, 1), 24, 40, window, seed=3)


def test_fused_mbconv_no_skip():
    # each stage's lead block: cin != cout, no residual (id_skip moot)
    _run_pair(BlockArgs(3, 1, 24, 40, 6, 1), 20, 28, None, seed=5)


def test_fused_mbconv_no_skip_windowed():
    sizes = np.array([[13, 21], [20, 28]], np.int32)
    off = placement_offset(sizes, 1)
    window = jnp.asarray(np.concatenate([off, sizes], axis=-1))
    _run_pair(BlockArgs(5, 1, 32, 48, 6, 1), 20, 28, window, seed=6)


def test_fused_mbconv_inside_backbone():
    """fuse_max_in_filters wiring: the fused backbone must match the plain
    one at inference (init always uses the unfused path, so variables are
    identical)."""
    from muscle_tpu.models.efficientnet import EfficientNet

    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    plain = EfficientNet(model_name="efficientnet-b0", last_pooling=False)
    variables = plain.init({"params": jax.random.key(4)}, jnp.asarray(x))
    fused = EfficientNet(
        model_name="efficientnet-b0", last_pooling=False, fuse_max_in_filters=128
    )
    import muscle_tpu.ops.pallas.mbconv as M

    orig = M.fused_mbconv_stride1
    M.fused_mbconv_stride1 = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        got = fused.apply(variables, jnp.asarray(x))
    finally:
        M.fused_mbconv_stride1 = orig
    want = plain.apply(variables, jnp.asarray(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5, rtol=1e-4)
