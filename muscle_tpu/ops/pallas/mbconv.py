"""Fused MBConv (inference) as two Pallas TPU kernels.

The XLA lowering of an MBConv block (models/efficientnet.py MBConvBlock;
reference src/efficientnet_pytorch/model.py:67-94) round-trips the 6x
expanded feature map through HBM ~5 times (expand out, depthwise in/out,
SE read, project in) — measured ~4% MXU / 0.15 TB/s effective on the b3
early stages (STATUS.md r2 backlog #2), i.e. the backbone is HBM-bound.
This module fuses the block into TWO kernels so the expanded tensor
crosses HBM exactly twice:

  kernel A (row-band grid, manual halo DMA):
      e = swish(bn0(expand_1x1(x)))        [skipped when expand_ratio == 1]
      e = e * window_mask_in               [padded-canvas exact mode]
      d = swish(bn1(depthwise_kxk(e)))     [stride 1]
      d = d * window_mask_out
      out: d  (+ per-band channel sums for SE)
  XLA glue (tiny): se = sigmoid(se_expand(swish(se_reduce(sum/count))))
  kernel B (plain blocked grid):
      y = bn2(project_1x1(d * se)) * window_mask_out + x

BN is inference-mode (running stats) and folded to per-channel
scale/bias OUTSIDE the kernels.  Only stride-1 blocks are fused (23 of 26
b3 blocks; the three stride-2 blocks would need strided sublane slices,
which Mosaic handles poorly — XLA keeps them).  Window masks are computed
in-kernel from per-image (oy, ox, h, w) scalars, so the exact-canvas mode
(models/efficientnet.py valid_window) costs no extra HBM traffic.

Parity: tests/test_pallas_mbconv.py asserts <= 1e-5 f32 against the Flax
block in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_bn(bn_params, bn_stats, eps: float):
    """Inference BatchNorm as (scale, bias): y = x * scale + bias."""
    inv = jax.lax.rsqrt(bn_stats["var"] + eps)
    scale = bn_params["scale"] * inv
    bias = bn_params["bias"] - bn_stats["mean"] * scale
    return scale, bias


def _front_kernel(
    win_ref,  # (B, 4) int32 in SMEM: per-image (oy, ox, h, w) valid window
    # (the full image bounds when no placement window is in play — masking
    # is ALWAYS applied: the zero-padded halo and the band padding must not
    # leak bn-bias patterns into the depthwise conv or the SE sums)
    x_hbm,  # (B, H + 2p, Wpad, Cpad) prepadded input, stays in HBM
    wexp_ref,  # (Cpad, Cmid) expand kernel ((1,1) conv); identity rows when
    # the block has no expand (the matmul then just drops the lane padding)
    s0_ref,  # (1, Cmid) folded bn0 scale
    b0_ref,  # (1, Cmid) folded bn0 bias
    wdw_ref,  # (k * k, Cmid) depthwise weights
    s1_ref,
    b1_ref,
    d_ref,  # out: (1, bh, W, Cmid) band of the depthwise output
    ssum_ref,  # out: (1, 1, Cmid) f32 per-band channel sums (SE partials)
    xs_ref,  # scratch: (bh + 2p, W + 2p, Cin)
    sem,
    *,
    k: int,
    bh: int,
    width: int,
    wpad: int,  # padded row width (>= width + 2p, multiple of 8 for the DMA)
    cpad: int,  # padded input channels (multiple of 128 for the DMA)
    cmid: int,
    has_expand: bool,
    compute_dtype,
):
    b = pl.program_id(0)
    band = pl.program_id(1)
    p = k // 2

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(band * bh, bh + 2 * p)], xs_ref, sem
    )
    copy.start()
    copy.wait()

    xs = xs_ref[:]  # (bh + 2p, Wpad, Cpad)
    flat = xs.reshape((bh + 2 * p) * wpad, cpad)
    e = jnp.dot(
        flat, wexp_ref[:], preferred_element_type=jnp.float32
    ).reshape(bh + 2 * p, wpad, cmid)
    if has_expand:
        e = e * s0_ref[0] + b0_ref[0]
        e = e * jax.nn.sigmoid(e)  # swish

    oy = win_ref[b, 0]
    ox = win_ref[b, 1]
    wh = win_ref[b, 2]
    ww = win_ref[b, 3]

    if has_expand:
        # mask the expand output so the depthwise kernel sees the zeros the
        # reference's SAME conv sees (bn0's bias makes the halo nonzero);
        # row/col coords include the p pad
        rows = jax.lax.broadcasted_iota(jnp.int32, (bh + 2 * p, wpad), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bh + 2 * p, wpad), 1)
        rglob = rows + band * bh - p  # unpadded row coordinate
        cglob = cols - p
        m = (rglob >= oy) & (rglob < oy + wh) & (cglob >= ox) & (cglob < ox + ww)
        # cast BEFORE the minor-dim insert: Mosaic can't reshape i1 vectors
        e = e * m.astype(jnp.float32)[:, :, None]

    e = e.astype(compute_dtype)
    acc = jnp.zeros((bh, width, cmid), jnp.float32)
    for ky in range(k):
        for kx in range(k):
            acc = acc + (
                e[ky : ky + bh, kx : kx + width, :]
                * wdw_ref[ky * k + kx][None, None, :]
            ).astype(jnp.float32)
    d = acc * s1_ref[0] + b1_ref[0]
    d = d * jax.nn.sigmoid(d)

    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, width), 0) + band * bh
    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, width), 1)
    m = (rows >= oy) & (rows < oy + wh) & (cols >= ox) & (cols < ox + ww)
    d = d * m.astype(jnp.float32)[:, :, None]

    d_ref[0] = d.astype(d_ref.dtype)
    # (8, cmid) broadcast: Mosaic requires the block's second-to-last dim
    # divisible by 8 (a (1, 1, cmid) block is unlowerable); row 0 is read
    ssum_ref[0, 0] = jnp.broadcast_to(jnp.sum(d, axis=(0, 1))[None], (8, d.shape[-1]))


def _back_kernel(
    win_ref,  # (B, 4) int32 SMEM
    d_ref,  # (1, bh, W, Cmid)
    x_ref,  # (1, bh, W, Cin)
    se_ref,  # (1, 8, Cmid) per-image SE gate (8-row broadcast for tiling)
    wpr_ref,  # (Cmid, Cout)
    s2_ref,  # (1, Cout)
    b2_ref,  # (1, Cout)
    y_ref,  # out: (1, bh, W, Cout)
    *,
    bh: int,
    width: int,
    cmid: int,
    cout: int,
    compute_dtype,
):
    b = pl.program_id(0)
    band = pl.program_id(1)
    d = d_ref[0].astype(jnp.float32) * se_ref[0, 0][None, None].astype(jnp.float32)
    flat = d.astype(compute_dtype).reshape(bh * width, cmid)
    y = jnp.dot(flat, wpr_ref[:], preferred_element_type=jnp.float32)
    y = y.reshape(bh, width, cout) * s2_ref[0] + b2_ref[0]

    oy = win_ref[b, 0]
    ox = win_ref[b, 1]
    wh = win_ref[b, 2]
    ww = win_ref[b, 3]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, width), 0) + band * bh
    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, width), 1)
    m = (rows >= oy) & (rows < oy + wh) & (cols >= ox) & (cols < ox + ww)
    y = y * m.astype(jnp.float32)[:, :, None]
    y_ref[0] = (y + x_ref[0].astype(jnp.float32)).astype(y_ref.dtype)


def _pick_band(
    h: int, w: int, cmid: int, cpad: int, k: int, vmem_budget: int = 10 << 20
) -> int:
    """Largest output band height (multiple of 8, dividing into ceil bands)
    whose working set fits the VMEM budget."""
    p = k // 2
    wpad = -(-(w + 2 * p) // 8) * 8
    for bh in (64, 32, 16, 8):
        if bh > h:
            continue
        bytes_ = (
            (bh + 2 * p) * wpad * cmid * 4  # e (f32 worst case)
            + (bh + 2 * p) * wpad * cpad * 2  # xs scratch (bf16-ish)
            + bh * w * cmid * 4  # acc
        )
        if bytes_ <= vmem_budget:
            return bh
    return 8


@functools.partial(
    jax.jit,
    static_argnames=("k", "has_expand", "se_ratio_filters", "interpret", "compute_dtype"),
)
def fused_mbconv_stride1(
    x,  # (B, H, W, Cin) NHWC
    params,  # the MBConvBlock param subtree (flax layout)
    stats,  # its batch_stats subtree
    window,  # (B, 4) int32 (oy, ox, h, w) or None
    *,
    k: int,
    has_expand: bool,
    se_ratio_filters: int,  # squeezed channel count (reference se_reduce out)
    bn_eps: float = 1e-3,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Inference-mode stride-1 MBConv with id-skip, fused (see module doc).

    Numerics match models/efficientnet.py MBConvBlock(train=False) to float
    reassociation (matmul accumulation f32 regardless of compute_dtype).
    """
    bsz, h, w, cin = x.shape
    wdw = params["_depthwise_conv"]["kernel"]  # (k, k, 1, Cmid)
    cmid = wdw.shape[-1]
    cout = params["_project_conv"]["kernel"].shape[-1]
    p = k // 2

    if window is None:
        # no placement window: mask to the full image bounds (the band/halo
        # padding must still be excluded from the depthwise halo + SE sums)
        win = jnp.tile(jnp.asarray([[0, 0, h, w]], jnp.int32), (bsz, 1))
    else:
        win = window.astype(jnp.int32)

    # lane alignment for the manual HBM DMA: Cin padded to a multiple of 128
    cpad = -(-cin // 128) * 128

    s1, b1 = _fold_bn(params["_bn1"], stats["_bn1"], bn_eps)
    s2, b2 = _fold_bn(params["_bn2"], stats["_bn2"], bn_eps)
    if has_expand:
        wexp = params["_expand_conv"]["kernel"][0, 0]  # (Cin, Cmid)
        s0, b0 = _fold_bn(params["_bn0"], stats["_bn0"], bn_eps)
    else:
        # identity: the in-kernel matmul then only strips the lane padding
        wexp = jnp.eye(cin, cmid, dtype=x.dtype)
        s0 = jnp.ones((cmid,), jnp.float32)
        b0 = jnp.zeros((cmid,), jnp.float32)
    wexp = jnp.pad(wexp, ((0, cpad - cin), (0, 0)))  # zero rows: no effect

    bh = _pick_band(h, w, cmid, cpad, k)
    nb = -(-h // bh)
    hp = nb * bh  # pad H so bands tile exactly
    # Mosaic DMA slices need the sublane (second-to-last) extent to be a
    # multiple of 8 — round the padded row width up; the depthwise slices
    # stop at 2p + width, so the extra right columns are never read
    wpad = -(-(w + 2 * p) // 8) * 8
    xp = jnp.pad(
        x.astype(compute_dtype),
        ((0, 0), (p, p + hp - h), (p, wpad - w - p), (0, cpad - cin)),
    )

    kern = functools.partial(
        _front_kernel,
        k=k, bh=bh, width=w, wpad=wpad, cpad=cpad, cmid=cmid,
        has_expand=has_expand, compute_dtype=compute_dtype,
    )
    d, ssum = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, nb),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
                pl.BlockSpec((cpad, cmid), lambda b, i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cmid), lambda b, i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cmid), lambda b, i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k * k, cmid), lambda b, i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cmid), lambda b, i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cmid), lambda b, i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, bh, w, cmid), lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, 8, cmid), lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((bh + 2 * p, wpad, cpad), compute_dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hp, w, cmid), compute_dtype),
            jax.ShapeDtypeStruct((bsz, nb, 8, cmid), jnp.float32),
        ],
        # Mosaic's default 16 MB scoped-vmem cap undercounts nothing — the
        # f32 expand temporaries genuinely exceed it on the wide early
        # stages; v5e has 128 MB VMEM, so grant the kernel half
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(
        win,
        xp,
        wexp.astype(compute_dtype),
        s0[None].astype(jnp.float32),
        b0[None].astype(jnp.float32),
        wdw.reshape(k * k, cmid).astype(compute_dtype),
        s1[None].astype(jnp.float32),
        b1[None].astype(jnp.float32),
    )

    # ---- SE gate (tiny, XLA) ------------------------------------------------
    count = (win[:, 2] * win[:, 3]).astype(jnp.float32)[:, None]
    se_in = jnp.sum(ssum[:, :, 0, :], axis=1) / count  # (B, Cmid) masked mean
    wr = params["_se_reduce"]["kernel"][0, 0]  # (Cmid, Csq)
    br = params["_se_reduce"]["bias"]
    we = params["_se_expand"]["kernel"][0, 0]  # (Csq, Cmid)
    be = params["_se_expand"]["bias"]
    se = jax.nn.sigmoid(jnp.dot(jax.nn.silu(jnp.dot(se_in, wr) + br), we) + be)

    back = functools.partial(
        _back_kernel, bh=bh, width=w, cmid=cmid, cout=cout,
        compute_dtype=compute_dtype,
    )
    xpad = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    y = pl.pallas_call(
        back,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, nb),
            in_specs=[
                pl.BlockSpec(
                    (1, bh, w, cmid), lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, bh, w, cin), lambda b, i, *_: (b, i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, 8, cmid), lambda b, i, *_: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cmid, cout), lambda b, i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), lambda b, i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cout), lambda b, i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, bh, w, cout), lambda b, i, *_: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, w, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(
        win,
        d,
        xpad,
        jnp.broadcast_to(se[:, None, :], (bsz, 8, cmid)).astype(jnp.float32),
        params["_project_conv"]["kernel"][0, 0].astype(compute_dtype),
        s2[None].astype(jnp.float32),
        b2[None].astype(jnp.float32),
    )
    return y[:, :h]
