"""YCbCr 4:2:0 host pack / device decode for fixed-size training crops.

The host->device relay link — not the TPU — bounds the training step
(tools/train_profile.py: 9.6 MB uint8 RGB per bs16 448^2 batch vs ~150 ms
of device compute).  Shipping the batch as full-res luma + 2x2-subsampled
chroma halves the bytes (1.5/pixel vs 3) at the cost of chroma smoothing:
VOC JPEGs are stored 4:2:0 on disk, so for real images the upload carries
the same chroma information PIL's RGB decode interpolated from; the only
loss is the BT.601 roundtrip (<= 1/255 per channel) plus the bilinear
(vs JPEG's fancier) chroma upsample.  Deviation from the reference's f32
RGB inputs (train_mcl.py:162): this is the DEFAULT on the train CLIs
(--upload ycbcr420; pass --upload rgb --device_norm 0 for the
reference-exact path).  Bounded two ways: per-pixel roundtrip error in
tests/test_datasets_cli.py::test_ycbcr420_training_roundtrip, and a
fixed-seed training A/B vs uint8 RGB (tools/ycbcr_ab.py, verdict in
BASELINE.md).

Same convention as the TTA canvases (data/tta.py pack_canvas_ycbcr /
inference/upload.py ycbcr420_unpack_fn) without the canvas machinery:
training crops are fixed-size, so no padding, transposes, or size planes.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def rgb_to_ycbcr420(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint8 RGB (H, W, 3), even H and W -> (y (H, W) u8, c (H/2, W/2, 2) u8).

    PIL's RGB->YCbCr (ITU-R BT.601 full range, the JPEG convention) + BOX
    2x chroma subsample — the exact inverse pair of ycbcr420_to_rgb.
    """
    h, w = arr.shape[:2]
    if h % 2 or w % 2:
        raise ValueError(f"ycbcr420 pack needs even sides, got {h}x{w}")
    ycc = Image.fromarray(np.ascontiguousarray(arr), "RGB").convert("YCbCr")
    y, cb, cr = (np.asarray(p) for p in ycc.split())
    c = np.stack(
        [
            np.asarray(Image.fromarray(p).resize((w // 2, h // 2), Image.BOX))
            for p in (cb, cr)
        ],
        axis=-1,
    )
    return y, c


def ycbcr420_to_rgb(y, c):
    """Device inverse: y (B, H, W) u8 + c (B, H/2, W/2, 2) u8 ->
    (B, H, W, 3) float32 RGB in [0, 255].

    Bilinear 2x chroma upsample (half-pixel centers, the standard 4:2:0
    siting — same call as inference/upload.py:59) + BT.601 full-range.
    jax-traced; call under jit so the conversion fuses into the consumer's
    input processing.
    """
    import jax
    import jax.numpy as jnp

    b, h, w = y.shape
    cup = jax.image.resize(
        c.astype(jnp.float32), (b, h, w, 2), method="bilinear"
    )
    yf = y.astype(jnp.float32)
    cb = cup[..., 0] - 128.0
    cr = cup[..., 1] - 128.0
    r = yf + 1.402 * cr
    g = yf - 0.344136 * cb - 0.714136 * cr
    bl = yf + 1.772 * cb
    return jnp.clip(jnp.stack([r, g, bl], axis=-1), 0.0, 255.0)
