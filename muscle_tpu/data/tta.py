"""Batched multi-scale + flip TTA producers.

The reference's MSF datasets emit per-image python lists of 8-12 tensors
consumed one-by-one at batch size 1 (reference src/data.py:336-365,
infer_mcl.py:107-146) — the #1 throughput bottleneck.  Here TTA is a
*batched* producer with two modes:

* 'bucket' (fast path): each scale gets one static padded canvas (long
  side of VOC is <=500, so scale s -> ceil(500*s/64)*64), images are
  top-left-placed and the valid region is cropped after the forward.  One
  compiled program per (scale, batch) shape serves the whole dataset.
* 'exact' (parity path): images grouped by identical pixel shape, no
  padding — bit-identical to the reference's per-image forwards, still
  batched for the dominant VOC shapes (500x375 et al).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from PIL import Image

from muscle_tpu.data import transforms as T

VOC_MAX_SIDE = 500


def bucket_side(scale: float, max_side: int = VOC_MAX_SIDE, align: int = 64) -> int:
    return int(math.ceil(max_side * scale / align)) * align


MSF_BUCKETS = {s: bucket_side(s) for s in (0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0)}


def scaled_size(w: int, h: int, scale: float) -> tuple[int, int]:
    """PIL (w, h) after the reference's rounding (src/data.py:350-352)."""
    return round(w * scale), round(h * scale)


def pack_canvas(pil_images, names, out_side: int, tight: bool):
    """uint8 upload canvas for the device-TTA engines.

    tight=False: square (B, out_side, out_side) canvas, images top-left.
    tight=True: (B, cs, out_side) canvas with portrait images stored
    TRANSPOSED — cs = the batch's max short side bucketed to a multiple of
    64 (VOC long sides are <=500 but short sides typically ~375), ~25%
    less host->device traffic.  Returns (canvas, orig_sizes, transposed)
    where transposed is None for the square layout.
    """
    import numpy as np

    b = len(pil_images)
    orig_sizes = np.zeros((b, 2), np.int32)
    arrs = []
    for i, img in enumerate(pil_images):
        arr = np.asarray(img)[..., :3]
        h, w = arr.shape[:2]
        if h > out_side or w > out_side:
            raise ValueError(f"image {names[i]} ({h}x{w}) exceeds canvas {out_side}")
        orig_sizes[i] = (h, w)
        arrs.append(arr)
    if not tight:
        canvas = np.zeros((b, out_side, out_side, 3), np.uint8)
        for i, arr in enumerate(arrs):
            canvas[i, : arr.shape[0], : arr.shape[1]] = arr
        return canvas, orig_sizes, None
    short = int(max(min(h, w) for (h, w) in orig_sizes))
    cs = min(out_side, ((short + 63) // 64) * 64)
    canvas = np.zeros((b, cs, out_side, 3), np.uint8)
    transposed = np.zeros(b, bool)
    for i, arr in enumerate(arrs):
        if arr.shape[0] > cs:
            arr = arr.transpose(1, 0, 2)
            transposed[i] = True
        canvas[i, : arr.shape[0], : arr.shape[1]] = arr
    return canvas, orig_sizes, transposed


def pack_canvas_ycbcr(pil_images, names, out_side: int, tight: bool = True):
    """Chroma-subsampled (4:2:0) upload canvases for the device-TTA engines.

    Y plane at full resolution, Cb/Cr box-averaged 2x (the JPEG/4:2:0
    convention — VOC JPEGs are stored this way on disk, so for real data
    this upload carries the same chroma information the RGB decode
    interpolated from), i.e. 1.5 bytes/pixel vs RGB's 3.  Layout mirrors
    pack_canvas: tight=True stores images whose height exceeds the
    bucketed short-side canvas TRANSPOSED (both planes).  The padded
    chroma edge is replicated one row/col so the device's bilinear 2x
    upsample never blends image chroma with canvas zeros inside the
    valid region.

    Returns (y_canvas (B, cs, S) u8, c_canvas (B, cs//2, S//2, 2) u8,
    orig_sizes (B, 2), transposed (B,) bool).  Device-side inverse:
    muscle_tpu/inference/upload.py ycbcr420_unpack_fn.
    """
    b = len(pil_images)
    orig_sizes = np.zeros((b, 2), np.int32)
    planes = []
    for i, img in enumerate(pil_images):
        w, h = img.size
        if h > out_side or w > out_side:
            raise ValueError(f"image {names[i]} ({h}x{w}) exceeds canvas {out_side}")
        orig_sizes[i] = (h, w)
        ycc = img.convert("YCbCr")
        y, cb, cr = (np.asarray(p) for p in ycc.split())
        cw, ch = (w + 1) // 2, (h + 1) // 2
        c = np.stack(
            [
                np.asarray(Image.fromarray(p).resize((cw, ch), Image.BOX))
                for p in (cb, cr)
            ],
            axis=-1,
        )
        planes.append((y, c))
    if tight:
        short = int(max(min(h, w) for (h, w) in orig_sizes))
        cs = min(out_side, ((short + 63) // 64) * 64)
    else:
        cs = out_side
    y_canvas = np.zeros((b, cs, out_side), np.uint8)
    c_canvas = np.zeros((b, cs // 2, out_side // 2, 2), np.uint8)
    transposed = np.zeros(b, bool)
    for i, (y, c) in enumerate(planes):
        if y.shape[0] > cs:
            y = y.transpose(1, 0)
            c = c.transpose(1, 0, 2)
            transposed[i] = True
        y_canvas[i, : y.shape[0], : y.shape[1]] = y
        ch, cw = c.shape[:2]
        c_canvas[i, :ch, :cw] = c
        # replicate chroma edge into the first padded row/col (bilinear 2x
        # upsample support reaches one sample past the valid boundary)
        if ch < cs // 2:
            c_canvas[i, ch, :cw] = c[-1]
        if cw < out_side // 2:
            c_canvas[i, : ch + (ch < cs // 2), cw] = c_canvas[
                i, : ch + (ch < cs // 2), cw - 1
            ]
    return y_canvas, c_canvas, orig_sizes, transposed


@dataclass
class MSFBatch:
    """One scale's device-ready TTA batch.

    images: (2B, S, S, 3) float32 — orig at even indices, flipped at odd
    (matching the reference's [img, flip] interleave, src/data.py:359-362).
    sizes: (B, 2) int32 valid (h, w) per image inside the canvas.
    """

    scale: float
    images: np.ndarray
    sizes: np.ndarray
    names: list[str]
    orig_sizes: np.ndarray  # (B, 2) original (H, W)


def msf_batch(
    pil_images: list[Image.Image],
    names: list[str],
    scale: float,
    canvas: int | tuple[int, int] | None = None,
    flip: bool = True,
    offsets: np.ndarray | None = None,
) -> MSFBatch:
    """Resize a batch of images to ``scale`` (CUBIC, like the reference),
    normalise, and place orig(+flip) into a static canvas.

    flip=False gives the MS (no-flip) variant (reference
    VOC12ClsDatasetMS, src/data.py:367-391).  ``offsets``: optional (B, 2)
    int per-image (oy, ox) canvas placement (TF-SAME alignment offsets,
    muscle_tpu.models.efficientnet.placement_offset)."""
    b = len(pil_images)
    if canvas is None:
        ch = cw = bucket_side(scale)
    elif isinstance(canvas, tuple):
        ch, cw = canvas
    else:
        ch = cw = canvas
    per = 2 if flip else 1
    out = np.zeros((per * b, ch, cw, 3), np.float32)
    sizes = np.zeros((b, 2), np.int32)
    orig = np.zeros((b, 2), np.int32)
    for i, img in enumerate(pil_images):
        w, h = img.size
        orig[i] = (h, w)
        tw, th = scaled_size(w, h, scale)
        oy, ox = (0, 0) if offsets is None else (int(offsets[i, 0]), int(offsets[i, 1]))
        arr = T.color_norm(np.asarray(img.resize((tw, th), resample=T.BICUBIC)))
        out[per * i, oy : oy + th, ox : ox + tw] = arr
        if flip:
            out[per * i + 1, oy : oy + th, ox : ox + tw] = arr[:, ::-1]
        sizes[i] = (th, tw)
    return MSFBatch(scale, out, sizes, list(names), orig)


def group_by_shape(pil_images, names):
    """'exact' mode grouping: indices of images sharing (w, h)."""
    groups: dict[tuple[int, int], list[int]] = {}
    for i, img in enumerate(pil_images):
        groups.setdefault(img.size, []).append(i)
    return groups
