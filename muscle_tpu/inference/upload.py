"""Device-side unpacking of the host upload canvases (host side:
muscle_tpu/data/tta.py pack_canvas / pack_canvas_ycbcr).

The host->device link — not the TPU — bounds the batched TTA engines
(BASELINE.md), so the upload format is the binding resource.  Three
layouts, all producing the same (B, side, side, 3) working canvas:

* square uint8 RGB (parity layout);
* tight transposed uint8 RGB (bitwise-identical, ~25% smaller);
* tight transposed YCbCr 4:2:0 (Y full-res + chroma half-res, 2x smaller
  than RGB on the same canvas).  VOC JPEGs are stored chroma-subsampled
  (4:2:0) on disk, so for the real dataset the half-res chroma upload
  carries the SAME information PIL's RGB decode interpolated from — the
  only loss is the BT.601 roundtrip (<=1/255 per channel) and the
  bilinear (vs JPEG's fancier) chroma upsample.  Bounded on synthetic
  worst-case noise images by tests/test_inference.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def square_unpack_fn(side: int):
    """tight RGB canvas (B, cs, side, 3) + per-image transposed flags ->
    square (B, side, side, 3) uint8 canvas (exact un-transpose)."""

    @jax.jit
    def unpack(canvas, transposed):
        sq = jnp.pad(canvas, ((0, 0), (0, side - canvas.shape[1]), (0, 0), (0, 0)))
        return jnp.where(
            transposed[:, None, None, None], sq.transpose(0, 2, 1, 3), sq
        )

    return unpack


@functools.lru_cache(maxsize=None)
def ycbcr420_unpack_fn(side: int):
    """(B, cs, side) uint8 Y + (B, cs//2, side//2, 2) uint8 CbCr (stored
    transposed per the flags) -> (B, side, side, 3) float32 RGB in
    [0, 255]: un-transpose both planes, bilinearly upsample chroma 2x
    (half-pixel centers, the standard 4:2:0 siting), BT.601 full-range
    conversion (the PIL 'YCbCr' convention)."""
    half = side // 2

    @jax.jit
    def unpack(y, c, transposed):
        ysq = jnp.pad(y, ((0, 0), (0, side - y.shape[1]), (0, 0)))
        ysq = jnp.where(transposed[:, None, None], ysq.transpose(0, 2, 1), ysq)
        csq = jnp.pad(c, ((0, 0), (0, half - c.shape[1]), (0, 0), (0, 0)))
        csq = jnp.where(
            transposed[:, None, None, None], csq.transpose(0, 2, 1, 3), csq
        )
        cup = jax.image.resize(
            csq.astype(jnp.float32), (csq.shape[0], side, side, 2), method="bilinear"
        )
        yf = ysq.astype(jnp.float32)
        cb = cup[..., 0] - 128.0
        cr = cup[..., 1] - 128.0
        r = yf + 1.402 * cr
        g = yf - 0.344136 * cb - 0.714136 * cr
        b = yf + 1.772 * cb
        return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)

    return unpack
