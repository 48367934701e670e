"""Bilinear resize as MXU matmuls, with exact PyTorch corner semantics.

The reference relies on ``torch.nn.functional.interpolate`` with BOTH corner
conventions (align_corners=True inside the model, e.g. src/MuSCLe.py:215,249,
256-257; align_corners=False in the IRN refinement path, infer_irn.py:76-79).
``jax.image.resize`` only provides half-pixel sampling, so we build the 1-D
interpolation matrices ourselves (numpy, at trace time — shapes are static
under jit) and apply them as two dense contractions:

    out[n, I, J, c] = W_h[I, h] * x[n, h, w, c] * W_w[J, w]

On TPU this maps straight onto the MXU and fuses with surrounding ops,
instead of the gather-based lowering a naive ``map_coordinates`` would take.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        src = (dst + 0.5) * in_size / out_size - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = src - lo
    w[np.arange(out_size), lo] = 1.0 - frac
    w[np.arange(out_size), lo + 1] = frac
    return w


def resize_bilinear(
    x: jax.Array,
    out_hw: tuple[int, int],
    align_corners: bool = True,
) -> jax.Array:
    """Bilinearly resize the two spatial axes of an NHWC (or HWC/HW) array.

    Matches ``torch.nn.functional.interpolate(mode='bilinear')`` for the
    requested corner convention exactly (see tests/test_resize.py for the
    parity check against torch on CPU).
    """
    squeeze_batch = False
    squeeze_channel = False
    if x.ndim == 2:
        x = x[None, :, :, None]
        squeeze_batch = squeeze_channel = True
    elif x.ndim == 3:
        x = x[None]
        squeeze_batch = True
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) != (oh, ow):
        wh = jnp.asarray(_interp_matrix(h, oh, align_corners), dtype=x.dtype)
        ww = jnp.asarray(_interp_matrix(w, ow, align_corners), dtype=x.dtype)
        # Two MXU contractions; XLA fuses the intermediate.  Interpolation
        # weights are exact in f32, so force full-precision accumulation —
        # default (bf16-ish) matmul precision visibly quantises the output.
        hp = jax.lax.Precision.HIGHEST
        x = jnp.einsum("Ih,nhwc->nIwc", wh, x, precision=hp)
        x = jnp.einsum("Jw,nIwc->nIJc", ww, x, precision=hp)
    if squeeze_channel:
        x = x[..., 0]
    if squeeze_batch:
        x = x[0]
    return x


def resize_to(x: jax.Array, like: jax.Array, align_corners: bool = True) -> jax.Array:
    """Resize ``x`` to the spatial shape of ``like`` (both NHWC)."""
    return resize_bilinear(x, (like.shape[1], like.shape[2]), align_corners)


def dynamic_window_resize(
    fm: jax.Array,
    src_box: jax.Array,
    out_hw: tuple[int, int],
    dst_hw: jax.Array | None = None,
    align_corners: bool = True,
    flip_x: bool = False,
) -> jax.Array:
    """Bilinearly sample a *dynamic* source window onto a static output grid.

    Used where the reference resizes runtime-sized regions (ragged EMD crops,
    TTA maps back to original image size): gather-based interpolation keeps
    the shapes static while the geometry stays data-dependent.

    Args:
      fm: (H, W, C) source map.
      src_box: (4,) int (row, col, h, w) window inside ``fm``.
      out_hw: static output grid (oh, ow).
      dst_hw: optional (2,) dynamic valid size inside the output grid; when
        given, output pixel (I, J) samples as if resizing the window to
        (dst_h, dst_w) — pixels beyond are clamped garbage the caller masks.
        When None, the full (oh, ow) grid is the target size.
      align_corners: True = torch align_corners semantics; False =
        half-pixel centres (cv2.resize/PIL semantics).
      flip_x: sample the window right-to-left (TTA un-flip fused into the
        resize).
    """
    hh, ww, _ = fm.shape
    oh, ow = out_hw
    r = src_box[0].astype(jnp.float32)
    c = src_box[1].astype(jnp.float32)
    h = src_box[2].astype(jnp.float32)
    w = src_box[3].astype(jnp.float32)
    if dst_hw is None:
        dh, dw = jnp.float32(oh), jnp.float32(ow)
    else:
        dh, dw = dst_hw[0].astype(jnp.float32), dst_hw[1].astype(jnp.float32)

    def coords(start, size, dst, out_size, limit, flip):
        i = jnp.arange(out_size, dtype=jnp.float32)
        if flip:
            i = dst - 1.0 - i
        if align_corners:
            scale = (size - 1.0) / jnp.maximum(dst - 1.0, 1.0)
            src = start + i * scale
        else:
            src = start + (i + 0.5) * size / dst - 0.5
        return jnp.clip(src, start, start + size - 1.0).clip(0.0, limit - 1.0)

    ys = coords(r, h, dh, oh, hh, False)
    xs = coords(c, w, dw, ow, ww, flip_x)

    def gather_axis(arr, cs, axis):
        lo = jnp.clip(jnp.floor(cs).astype(jnp.int32), 0, arr.shape[axis] - 2)
        frac = cs - lo
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, lo + 1, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = -1
        return a * (1 - frac.reshape(shape)) + b * frac.reshape(shape)

    out = gather_axis(fm, ys, 0)
    return gather_axis(out, xs, 1)


def _cubic_kernel(t: jax.Array, a: float = -0.5) -> jax.Array:
    """Keys cubic convolution kernel (a=-0.5, what PIL's BICUBIC uses)."""
    at = jnp.abs(t)
    w1 = (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0
    w2 = a * (at**3 - 5.0 * at**2 + 8.0 * at - 4.0)
    return jnp.where(at <= 1.0, w1, jnp.where(at < 2.0, w2, 0.0))


def dynamic_cubic_resize_weights(
    src_len: jax.Array,
    dst_len: jax.Array,
    src_cap: int,
    dst_cap: int,
    flip: bool = False,
    dst_off: jax.Array | float = 0.0,
) -> jax.Array:
    """(dst_cap, src_cap) on-device bicubic interpolation weights for a
    dynamic src_len -> dst_len resize (both live in static canvases).

    Replicates PIL's antialiased BICUBIC (half-pixel centres, kernel
    support widened by the downscale factor, boundary renormalisation) —
    the resample the reference's MSF datasets use (src/data.py:162).  Rows
    beyond dst_len are zero; columns beyond src_len are masked out before
    row normalisation.  ``flip=True`` samples the source right-to-left
    (fused TTA flip).  ``dst_off`` places the output window at
    [dst_off, dst_off + dst_len) instead of the canvas origin (TF-SAME
    alignment placement, see models/efficientnet.py placement_offset).
    """
    src = src_len.astype(jnp.float32)
    dst = dst_len.astype(jnp.float32)
    off = jnp.asarray(dst_off, jnp.float32)
    i0 = jax.lax.broadcasted_iota(jnp.float32, (dst_cap, src_cap), 0) - off
    i = dst - 1.0 - i0 if flip else i0
    y = jax.lax.broadcasted_iota(jnp.float32, (dst_cap, src_cap), 1)
    center = (i + 0.5) * src / dst - 0.5
    support_scale = jnp.maximum(src / dst, 1.0)  # PIL antialias widening
    w = _cubic_kernel((y - center) / support_scale)
    w = jnp.where(y < src, w, 0.0)  # clip to valid source
    w = jnp.where((i0 >= 0.0) & (i0 < dst), w, 0.0)
    denom = jnp.sum(w, axis=1, keepdims=True)
    return w / jnp.where(denom == 0.0, 1.0, denom)


def dynamic_bilinear_resize_weights(
    src_len: jax.Array,
    dst_len: jax.Array,
    src_cap: int,
    dst_cap: int,
    align_corners: bool,
    flip: bool = False,
    src_off: jax.Array | float = 0.0,
    dst_off: jax.Array | float = 0.0,
) -> jax.Array:
    """(dst_cap, src_cap) bilinear interpolation weights for a dynamic
    src_len -> dst_len resize (matrix form of the two conventions used by
    the reference: torch align_corners=True and cv2/PIL half-pixel).
    Boundary renormalisation == coordinate clamping for the width-1
    bilinear kernel.  ``flip=True`` indexes the OUTPUT right-to-left
    (the TTA un-flip fused in).  ``src_off``/``dst_off`` read/write the
    windows at [off, off + len) inside their canvases (TF-SAME alignment
    placement, models/efficientnet.py placement_offset)."""
    src = src_len.astype(jnp.float32)
    dst = dst_len.astype(jnp.float32)
    soff = jnp.asarray(src_off, jnp.float32)
    doff = jnp.asarray(dst_off, jnp.float32)
    i0 = jax.lax.broadcasted_iota(jnp.float32, (dst_cap, src_cap), 0) - doff
    i = dst - 1.0 - i0 if flip else i0
    y = jax.lax.broadcasted_iota(jnp.float32, (dst_cap, src_cap), 1) - soff
    if align_corners:
        center = i * (src - 1.0) / jnp.maximum(dst - 1.0, 1.0)
    else:
        center = (i + 0.5) * src / dst - 0.5
    w = jnp.maximum(0.0, 1.0 - jnp.abs(y - center))
    w = jnp.where((y >= 0.0) & (y < src), w, 0.0)
    w = jnp.where((i0 >= 0.0) & (i0 < dst), w, 0.0)
    denom = jnp.sum(w, axis=1, keepdims=True)
    return w / jnp.where(denom == 0.0, 1.0, denom)


def composed_cam_resize_weights(
    map_len: jax.Array,
    mid_len: jax.Array,
    dst_len: jax.Array,
    map_cap: int,
    mid_cap: int,
    dst_cap: int,
    flip: bool = False,
) -> jax.Array:
    """The reference CAM resample chain as ONE (dst_cap, map_cap) matrix.

    The reference resizes stride-16 maps in two stages: model-internal
    bilinear to the input size with align_corners=True (src/MuSCLe.py
    :256-257), then cv2 half-pixel bilinear to the original image size
    (infer_mcl.py:130-135).  Both stages are linear maps, so their
    composition is exact — the TTA fast paths apply it at single-resize
    cost instead of approximating with one resize (the formerly dominant
    fast-path deviation, DEVIATIONS.md #6)."""
    w1 = dynamic_bilinear_resize_weights(
        map_len, mid_len, map_cap, mid_cap, align_corners=True
    )
    w2 = dynamic_bilinear_resize_weights(
        mid_len, dst_len, mid_cap, dst_cap, align_corners=False, flip=flip
    )
    return w2 @ w1


def batched_window_resize_ac(src: jax.Array, src_win: jax.Array,
                             dst_win: jax.Array, dst_hw: tuple[int, int]) -> jax.Array:
    """Per-image align_corners=True bilinear resize of the valid window
    ``src_win`` ((N, 4) int (oy, ox, h, w)) of ``src`` onto the window
    ``dst_win`` of a static (dst_h, dst_w) canvas — the reference's
    F.interpolate on UNPADDED feature maps (src/MuSCLe.py:47-54, 248-253)
    reproduced inside padded canvases.  Zero outside the destination
    window."""
    hs, ws = src.shape[1:3]
    hd, wd = dst_hw
    hp = jax.lax.Precision.HIGHEST

    def one(m, sw, dw):
        wh = dynamic_bilinear_resize_weights(
            sw[2], dw[2], hs, hd, align_corners=True,
            src_off=sw[0], dst_off=dw[0],
        )
        ww = dynamic_bilinear_resize_weights(
            sw[3], dw[3], ws, wd, align_corners=True,
            src_off=sw[1], dst_off=dw[1],
        )
        a = jnp.einsum("Iy,yxc->Ixc", wh, m, precision=hp)
        return jnp.einsum("Jx,Ixc->IJc", ww, a, precision=hp)

    return jax.vmap(one)(src, src_win, dst_win)


def dynamic_avgpool3s2_weights(src_len: jax.Array, src_cap: int,
                               dst_cap: int, src_off: jax.Array | int = 0
                               ) -> jax.Array:
    """(dst_cap, src_cap) 1D weights of one axis of torch's
    ``F.avg_pool2d(kernel_size=3, stride=2, padding=1)`` with
    count_include_pad=True (the BiFPN downsample, reference
    src/MuSCLe.py:51,54) applied to the dynamic window
    [src_off, src_off + src_len): output row j (window coords, written at
    the canvas origin) averages source rows 2j-1..2j+1 with weight 1/3
    each — taps outside the window contribute zero but the divisor stays
    3, exactly torch's zero-pad counting.  Output rows beyond
    ceil(src_len/2) are zero.  The 2D pool is separable, so the canvas
    pool is two einsums with these weights."""
    src = src_len.astype(jnp.int32)
    off = jnp.asarray(src_off, jnp.int32)
    dst = (src + 1) // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (dst_cap, src_cap), 0)
    y = jax.lax.broadcasted_iota(jnp.int32, (dst_cap, src_cap), 1) - off
    w = (
        (y >= 2 * i - 1) & (y <= 2 * i + 1)
        & (y >= 0) & (y < src) & (i < dst)
    )
    return w.astype(jnp.float32) / 3.0


def batched_window_avgpool_s2(src: jax.Array, src_win: jax.Array,
                              dst_hw: tuple[int, int]):
    """Per-image window avg_pool(3, 2, pad=1, count_include_pad) of the
    windows ``src_win`` of ``src`` onto a static (dst_h, dst_w) canvas at
    the ORIGIN.  Returns (pooled, pooled_win) with pooled_win =
    (0, 0, ceil(h/2), ceil(w/2))."""
    hs, ws = src.shape[1:3]
    hd, wd = dst_hw
    hp = jax.lax.Precision.HIGHEST

    def one(m, sw):
        wh = dynamic_avgpool3s2_weights(sw[2], hs, hd, src_off=sw[0])
        ww = dynamic_avgpool3s2_weights(sw[3], ws, wd, src_off=sw[1])
        a = jnp.einsum("Iy,yxc->Ixc", wh, m, precision=hp)
        return jnp.einsum("Jx,Ixc->IJc", ww, a, precision=hp)

    pooled = jax.vmap(one)(src, src_win)
    zero = jnp.zeros_like(src_win[:, 0])
    pooled_win = jnp.stack(
        [zero, zero, (src_win[:, 2] + 1) // 2, (src_win[:, 3] + 1) // 2], axis=-1
    )
    return pooled, pooled_win


def avg_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """3x3/stride-2/pad-1 average pool with count_include_pad=True.

    Matches ``F.avg_pool2d(x, kernel_size=3, stride=2, padding=1)`` as used
    by the BiFPN downsample path (reference src/MuSCLe.py:51,54): zero-pad,
    window-sum, divide by the full kernel area (torch's default counts the
    padded zeros).
    """
    summed = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return summed / 9.0
