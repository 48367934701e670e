"""Fused MBConv (inference) as ONE whole-image Pallas TPU kernel.

The XLA lowering of an MBConv block (models/efficientnet.py MBConvBlock;
reference src/efficientnet_pytorch/model.py:67-94) round-trips the 6x
expanded feature map through HBM ~5 times (expand out, depthwise in/out,
SE read, project in).  This kernel runs the ENTIRE block per image in
one grid step with everything resident in VMEM, so HBM sees exactly two
tensors: x in, y out.

MEASURED OUTCOME (v5e, tools/stage_bench.py --reps 120, RTT amortised):
XLA wins.  The round-2 "1.9-4.6 ms/block, ~4% MXU" numbers that
motivated this kernel were contaminated by the axon relay's ~25 ms
result-fetch RTT at --reps 20; at --reps 120 the XLA block runs
0.37-3.2 ms (s4..s1), ~0.44 TB/s effective INCLUDING its ~5 crossings
of e — near the HBM roofline.  This kernel measures 0.56-3.4 ms, 1.1x
(s1) to 2.6x (s3/s5) SLOWER: tools/mbconv_bisect.py shows the floor is
Mosaic codegen on sub-128-channel NHWC, not the algorithm — the pure
load/store skeleton alone (copyonly) runs at 0.15 TB/s (64-byte lane
rows at c32), and the expand matmul reaches ~9 TFLOP/s bf16 (K=32 and a
non-sublane-aligned flatten).  A perfect fusion would still win ~10x on
paper, but it needs a layout Mosaic can move at HBM peak (e.g. a
flattened (H, W*C) DMA view + in-VMEM relayout).  That frontier was
probed and CLOSED (tools/mbconv_dma_probe.py): Mosaic rejects the
(H, W*C)->(H*W, C) shape cast, and the chip's measured streaming
ceiling is ~0.21 TB/s (tools/mbconv_dma_probe.py docstring) — the
"~10x on paper" assumed 819 GB/s HBM that this part does not deliver,
so the XLA lowering is already at the effective roofline.
The kernel stays OPT-IN (MuSCLe.fuse_mbconv=0 default,
parity-tested) and the production path keeps the XLA lowering.

  grid = (B,); per image (fori_loop over row bands):
    band A: e = swish(bn0(expand_1x1(x[band+halo])))   [identity if e1]
            e = e * window_mask                         [halo re-zeroing]
            d[band] = swish(bn1(depthwise_kxk(e))) * mask   -> VMEM scratch
            ssum += sum_hw d[band]                      [SE partials]
    se = sigmoid(se_expand(swish(se_reduce(ssum / count))))   [in-kernel]
    band B: y[band] = bn2(project_1x1(d[band] * se)) * mask [+ x[band]]

The band loops are lax.fori_loop (NOT Python-unrolled: Mosaic's stack
allocator keeps unrolled bands' temporaries live simultaneously and
OOMs VMEM on 256^2 stages).  The last band overlaps its predecessor
(start = min(i*bh, h-bh)) — band writes are idempotent and the SE sum
guards re-counted rows with a row >= i*bh mask.  The spatial pad (k//2
halo) is applied OUTSIDE by jnp.pad, so band slices never hit a
boundary condition; the input block is the padded image and Pallas's
automatic pipelining overlaps the next image's DMA with the current
image's compute.  There is no manual DMA and therefore no lane/sublane
alignment constraint — the early stages' 24-96 channel tensors are NOT
padded to 128 in HBM (Mosaic pads VMEM tiles internally, which costs
VPU lanes but no bandwidth).

BN is inference-mode (running stats) folded to per-channel scale/bias
outside the kernel.  Any stride-1 SE block is fusable — with id-skip
the residual add rides the same kernel; without it (each stage's lead
block, cin != cout) the add is skipped, matching the Flax path.  The
stride-2 blocks would halve the output grid mid-kernel; XLA keeps them.
Window masks come from per-image (oy, ox, h, w) scalars in SMEM so the
padded-canvas exact mode (models/efficientnet.py valid_window) costs no
extra HBM traffic; masking is ALWAYS applied — bn biases make the
zero-pad halo nonzero, and the reference's unpadded TF-SAME convs
(src/efficientnet_pytorch/utils.py:103-145) must see zeros there.

Parity: tests/test_pallas_mbconv.py asserts <= 1e-5 f32 against the Flax
block in interpret mode; tools/stage_bench.py measures the real-chip A/B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 << 20  # v5e has 128 MB; leave headroom for the runtime


def _fold_bn(bn_params, bn_stats, eps: float):
    """Inference BatchNorm as (scale, bias): y = x * scale + bias."""
    inv = jax.lax.rsqrt(bn_stats["var"] + eps)
    scale = bn_params["scale"] * inv
    bias = bn_params["bias"] - bn_stats["mean"] * scale
    return scale, bias


def _lane_pad(c: int) -> int:
    return -(-c // 128) * 128


def _sub_pad(n: int) -> int:
    return -(-n // 8) * 8


def _plan(h: int, w: int, cin: int, cmid: int, cout: int, k: int,
          compute_dtype):
    """(band_height, resident_vmem_bytes) for the whole-image kernel,
    using Mosaic's (8, 128) tile-padded VMEM sizes."""
    p = k // 2
    esz = 2 if compute_dtype == jnp.bfloat16 else 4
    cin_l, cmid_l, cout_l = _lane_pad(cin), _lane_pad(cmid), _lane_pad(cout)
    x_blk = (h + 2 * p) * _sub_pad(w + 2 * p) * cin_l * esz
    y_blk = h * _sub_pad(w) * cout_l * esz
    d_full = h * _sub_pad(w) * cmid_l * esz
    base = 2 * x_blk + 2 * y_blk + d_full  # x/y double-buffered
    for bh in (64, 32, 16, 8):
        bh = min(bh, h)
        band = (
            (bh + 2 * p) * _sub_pad(w + 2 * p) * cin_l * esz  # xs slice
            + (bh + 2 * p) * _sub_pad(w + 2 * p) * cmid_l * (4 + esz)  # e f32+cast
            + bh * _sub_pad(w) * cmid_l * (4 + 4)  # acc + d f32
        )
        if base + band <= (_VMEM_LIMIT - (10 << 20)):
            return bh, base + band
    return min(8, h), base


def fused_fits_vmem(h: int, w: int, cin: int, cmid: int, cout: int, k: int,
                    compute_dtype=jnp.bfloat16) -> bool:
    """Static eligibility check used by MBConvBlock before dispatching."""
    _, bytes_ = _plan(h, w, cin, cmid, cout, k, compute_dtype)
    return bytes_ <= (_VMEM_LIMIT - (10 << 20))


def _kernel(
    win_ref,  # (B, 4) int32 in SMEM: per-image (oy, ox, h, w) valid window
    x_ref,  # (1, H + 2p, W + 2p, Cin) spatially prepadded image, VMEM
    wexp_ref,  # (Cin, Cmid) expand kernel ((1,1) conv); unused when e1
    s0_ref,  # (8, Cmid) folded bn0 scale (row-broadcast)
    b0_ref,  # (8, Cmid) folded bn0 bias
    wdw_ref,  # (k * k, Cmid) depthwise weights
    s1_ref,  # (8, Cmid)
    b1_ref,
    wr_ref,  # (Cmid, Csq) se_reduce
    br_ref,  # (8, Csq)
    we_ref,  # (Csq, Cmid) se_expand
    be_ref,  # (8, Cmid)
    wpr_ref,  # (Cmid, Cout) project kernel
    s2_ref,  # (8, Cout)
    b2_ref,
    y_ref,  # out: (1, H, W, Cout)
    d_ref,  # scratch: (H, W, Cmid) depthwise output, whole image
    *,
    k: int,
    h: int,
    w: int,
    bh: int,
    cmid: int,
    has_expand: bool,
    has_skip: bool,
    compute_dtype,
):
    b = pl.program_id(0)
    p = k // 2
    nb = -(-h // bh)
    oy = win_ref[b, 0]
    ox = win_ref[b, 1]
    wh = win_ref[b, 2]
    ww = win_ref[b, 3]

    def win_mask(shape, row0, col0):
        """(rows, cols) valid-window f32 mask; coords are unpadded-image.
        row0 may be traced (band offset)."""
        rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
        cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0
        m = ((rows >= oy) & (rows < oy + wh)
             & (cols >= ox) & (cols < ox + ww))
        # cast before any minor-dim insert: Mosaic can't reshape i1 vectors
        return m.astype(jnp.float32)

    # ---- band loop A: expand -> depthwise -> d scratch + SE partials ----
    def band_a(i, ssum):
        y0 = jnp.minimum(i * bh, h - bh)  # last band overlaps (idempotent)
        xs = x_ref[0, pl.ds(y0, bh + 2 * p), :, :]
        if has_expand:
            flat = xs.reshape((bh + 2 * p) * (w + 2 * p), xs.shape[-1])
            e = jnp.dot(
                flat, wexp_ref[:], preferred_element_type=jnp.float32
            ).reshape(bh + 2 * p, w + 2 * p, cmid)
            e = e * s0_ref[0] + b0_ref[0]
            e = e * jax.nn.sigmoid(e)  # swish
        else:
            e = xs.astype(jnp.float32)
        # zero outside the valid window: the halo is bn-bias-coloured and
        # the reference's SAME conv sees zeros there
        m = win_mask((bh + 2 * p, w + 2 * p), y0 - p, -p)
        e = (e * m[:, :, None]).astype(compute_dtype)

        acc = jnp.zeros((bh, w, cmid), jnp.float32)
        for ky in range(k):
            for kx in range(k):
                acc = acc + (
                    e[ky : ky + bh, kx : kx + w, :]
                    * wdw_ref[ky * k + kx][None, None, :]
                ).astype(jnp.float32)
        d = acc * s1_ref[0] + b1_ref[0]
        d = d * jax.nn.sigmoid(d)
        d = d * win_mask((bh, w), y0, 0)[:, :, None]
        d_ref[pl.ds(y0, bh)] = d.astype(d_ref.dtype)
        # guard rows the previous band already summed (overlap region)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0) + y0
        g = (rows >= i * bh).astype(jnp.float32)
        part = jnp.sum((d * g[:, :, None]).reshape(bh * w, cmid),
                       axis=0, keepdims=True)  # (1, cmid)
        return ssum + part

    ssum = jax.lax.fori_loop(0, nb, band_a, jnp.zeros((1, cmid), jnp.float32))

    # ---- SE gate, fully in-kernel (8-row broadcast: Mosaic needs >=8
    # sublanes for the tiny matmuls; row 0 is the value) -----------------
    count = (wh * ww).astype(jnp.float32)
    se_in = jnp.broadcast_to(ssum / count, (8, cmid))
    sq = jnp.dot(se_in.astype(compute_dtype), wr_ref[:],
                 preferred_element_type=jnp.float32) + br_ref[:]
    sq = sq * jax.nn.sigmoid(sq)  # swish
    se = jnp.dot(sq.astype(compute_dtype), we_ref[:],
                 preferred_element_type=jnp.float32) + be_ref[:]
    se = jax.nn.sigmoid(se)  # (8, cmid)

    # ---- band loop B: gate -> project -> (+x) ---------------------------
    cout = y_ref.shape[-1]

    def band_b(i, carry):
        y0 = jnp.minimum(i * bh, h - bh)
        d = d_ref[pl.ds(y0, bh)].astype(jnp.float32) * se[0][None, None]
        flat = d.astype(compute_dtype).reshape(bh * w, cmid)
        y = jnp.dot(flat, wpr_ref[:], preferred_element_type=jnp.float32)
        y = y.reshape(bh, w, cout) * s2_ref[0] + b2_ref[0]
        y = y * win_mask((bh, w), y0, 0)[:, :, None]
        if has_skip:
            xin = x_ref[0, pl.ds(y0 + p, bh), p : p + w, :]
            y = y + xin.astype(jnp.float32)
        y_ref[0, pl.ds(y0, bh)] = y.astype(y_ref.dtype)
        return carry

    jax.lax.fori_loop(0, nb, band_b, jnp.int32(0))


@functools.partial(
    jax.jit,
    static_argnames=("k", "has_expand", "se_ratio_filters", "interpret",
                     "compute_dtype"),
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
    """Inference-mode stride-1 MBConv, fused (see module doc).  The
    residual add is taken iff Cin == Cout (the Flax id-skip condition for
    stride-1 blocks).

    Numerics match models/efficientnet.py MBConvBlock(train=False) to float
    reassociation (matmul accumulation f32 regardless of compute_dtype).
    """
    bsz, h, w, cin = x.shape
    wdw = params["_depthwise_conv"]["kernel"]  # (k, k, 1, Cmid)
    cmid = wdw.shape[-1]
    cout = params["_project_conv"]["kernel"].shape[-1]
    p = k // 2

    if window is None:
        # no placement window: mask to the full image bounds (the spatial
        # pad must still be excluded from the depthwise halo + SE sums)
        win = jnp.tile(jnp.asarray([[0, 0, h, w]], jnp.int32), (bsz, 1))
    else:
        win = window.astype(jnp.int32)

    s1, b1 = _fold_bn(params["_bn1"], stats["_bn1"], bn_eps)
    s2, b2 = _fold_bn(params["_bn2"], stats["_bn2"], bn_eps)
    if has_expand:
        wexp = params["_expand_conv"]["kernel"][0, 0]  # (Cin, Cmid)
        s0, b0 = _fold_bn(params["_bn0"], stats["_bn0"], bn_eps)
    else:
        wexp = jnp.zeros((cin, cmid), x.dtype)  # unused placeholder
        s0 = jnp.ones((cmid,), jnp.float32)
        b0 = jnp.zeros((cmid,), jnp.float32)

    xp = jnp.pad(x.astype(compute_dtype), ((0, 0), (p, p), (p, p), (0, 0)))
    bh, _ = _plan(h, w, cin, cmid, cout, k, compute_dtype)

    def bcast8(v):  # (C,) -> (8, C) f32 row-broadcast for Mosaic tiling
        return jnp.broadcast_to(v[None].astype(jnp.float32), (8, v.shape[0]))

    kern = functools.partial(
        _kernel,
        k=k, h=h, w=w, bh=bh, cmid=cmid, has_expand=has_expand,
        has_skip=cin == cout, compute_dtype=compute_dtype,
    )
    rep = lambda *_: (0, 0)  # replicated operand, any grid step  # noqa: E731
    y = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec((1, h + 2 * p, w + 2 * p, cin),
                             lambda b, *_: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cin, cmid), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cmid), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cmid), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((k * k, cmid), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cmid), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cmid), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((cmid, se_ratio_filters), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, se_ratio_filters), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((se_ratio_filters, cmid), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cmid), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((cmid, cout), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cout), rep, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cout), rep, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, w, cout), lambda b, *_: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((h, w, cmid), compute_dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(
        win,
        xp,
        wexp.astype(compute_dtype),
        bcast8(s0),
        bcast8(b0),
        wdw.reshape(k * k, cmid).astype(compute_dtype),
        bcast8(s1),
        bcast8(b1),
        params["_se_reduce"]["kernel"][0, 0].astype(compute_dtype),
        bcast8(params["_se_reduce"]["bias"]),
        params["_se_expand"]["kernel"][0, 0].astype(compute_dtype),
        bcast8(params["_se_expand"]["bias"]),
        params["_project_conv"]["kernel"][0, 0].astype(compute_dtype),
        bcast8(s2),
        bcast8(b2),
    )
    return y
