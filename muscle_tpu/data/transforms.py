"""Host-side image transforms (numpy / PIL), deterministic via explicit
numpy Generators.

Capability parity with reference src/imutils.py + the torchvision calls in
train_mcl.py:106-115, re-implemented for a torchvision-free host pipeline.
Device-side work (normalisation is kept here to match the reference's CPU
ordering: jitter happens on uint8 *before* normalisation).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance

IMAGENET_MEAN = np.array([[[0.485, 0.456, 0.406]]], dtype=np.float64)
IMAGENET_STD = np.array([[[0.229, 0.224, 0.225]]], dtype=np.float64)
# nearest uint8 to the mean: pad/erase fill for the uint8 (device-norm)
# pipeline — normalises on device to |x| <= 0.5/255/std ~ 0.009 instead of
# the reference's exact 0 (bounded deviation, tests/test_datasets.py)
IMAGENET_MEAN_U8 = np.round(IMAGENET_MEAN[0, 0] * 255.0).astype(np.uint8)

# Pillow 10 removed Image.CUBIC; the reference used PIL.Image.CUBIC
# (== BICUBIC) for all multi-scale resizes (src/data.py:162).
BICUBIC = Image.BICUBIC
BILINEAR = Image.BILINEAR


def color_norm(img: np.ndarray) -> np.ndarray:
    """ImageNet mean/std normalisation (reference src/imutils.py:383-388)."""
    return ((np.asarray(img) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def denorm_to_uint8(img: np.ndarray) -> np.ndarray:
    """Inverse of color_norm for visualisation (reference train_mcl.py:257-266)."""
    x = (img * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(x, 0, 255).astype(np.uint8)


def random_resize_long(
    img: Image.Image, min_long: int, max_long: int, rng: np.random.Generator
) -> Image.Image:
    """Resize so the long side is uniform in [min_long, max_long]
    (reference RandomResizeLong, src/imutils.py:120-140; CUBIC resample)."""
    target_long = int(rng.integers(min_long, max_long + 1))
    w, h = img.size
    if w < h:
        shape = (int(round(w * target_long / h)), target_long)
    else:
        shape = (target_long, int(round(h * target_long / w)))
    return img.resize(shape, resample=BICUBIC)


def random_crop(
    arr: np.ndarray,
    cropsize: int,
    rng: np.random.Generator,
    extra: np.ndarray | None = None,
    fill=0.0,
):
    """Random crop, zero-padding when the image is smaller than the crop
    (reference RandomCrop, src/imutils.py:143-181; WithMask variant :80-118).

    arr (and optional ``extra``, cropped jointly) are HWC.  Output dtype
    follows ``arr`` for float inputs (float32) and is preserved for uint8
    (the device-norm pipeline); ``fill`` sets the padding value of the
    FIRST array only (uint8 pipelines pass the ImageNet mean so that
    on-device normalisation maps the pad to ~0 like the reference's
    normalised-space zero pad) — ``extra`` (masks) always pads with 0.
    """
    h, w = arr.shape[:2]
    ch, cw = min(cropsize, h), min(cropsize, w)
    w_space, h_space = w - cropsize, h - cropsize
    if w_space > 0:
        cont_left, img_left = 0, int(rng.integers(0, w_space + 1))
    else:
        cont_left, img_left = int(rng.integers(0, -w_space + 1)), 0
    if h_space > 0:
        cont_top, img_top = 0, int(rng.integers(0, h_space + 1))
    else:
        cont_top, img_top = int(rng.integers(0, -h_space + 1)), 0

    def place(a: np.ndarray, fill_value=0.0) -> np.ndarray:
        dt = a.dtype if a.dtype == np.uint8 else np.float32
        out = np.full((cropsize, cropsize, a.shape[-1]), fill_value, dt)
        out[cont_top : cont_top + ch, cont_left : cont_left + cw] = a[
            img_top : img_top + ch, img_left : img_left + cw
        ]
        return out

    if extra is None:
        return place(arr, fill)
    return place(arr, fill), place(extra)


def color_jitter(
    img: Image.Image,
    rng: np.random.Generator,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.1,
) -> Image.Image:
    """torchvision-style ColorJitter (train_mcl.py:108) without torchvision:
    factor-enhance ops in a random order + HSV hue shift."""
    ops = []
    if brightness > 0:
        f = float(rng.uniform(1 - brightness, 1 + brightness))
        ops.append(lambda im: ImageEnhance.Brightness(im).enhance(f))
    if contrast > 0:
        f2 = float(rng.uniform(1 - contrast, 1 + contrast))
        ops.append(lambda im: ImageEnhance.Contrast(im).enhance(f2))
    if saturation > 0:
        f3 = float(rng.uniform(1 - saturation, 1 + saturation))
        ops.append(lambda im: ImageEnhance.Color(im).enhance(f3))
    if hue > 0:
        shift = float(rng.uniform(-hue, hue))

        def hue_op(im: Image.Image) -> Image.Image:
            hsv = np.array(im.convert("HSV"))
            hsv[..., 0] = (hsv[..., 0].astype(np.int16) + int(shift * 255)) % 256
            return Image.fromarray(hsv, "HSV").convert("RGB")

        ops.append(hue_op)
    order = rng.permutation(len(ops))
    for i in order:
        img = ops[i](img)
    return img


def random_erasing(
    arr: np.ndarray,
    rng: np.random.Generator,
    p: float = 0.5,
    scale: tuple[float, float] = (0.02, 0.2),
    ratio: tuple[float, float] = (0.3, 3.3),
    value=0.0,
) -> np.ndarray:
    """torchvision RandomErasing semantics (train_mcl.py:114): erase a random
    rectangle (value 0) with probability p.  arr: HWC float or uint8 (the
    device-norm pipeline passes the ImageNet-mean uint8 as ``value`` so the
    erased region normalises to ~0 on device, matching the reference's
    erase-after-normalise)."""
    if rng.random() >= p:
        return arr
    h, w = arr.shape[:2]
    area = h * w
    for _ in range(10):
        target = float(rng.uniform(*scale)) * area
        aspect = float(np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1]))))
        eh = int(round(np.sqrt(target * aspect)))
        ew = int(round(np.sqrt(target / aspect)))
        if eh < h and ew < w:
            top = int(rng.integers(0, h - eh + 1))
            left = int(rng.integers(0, w - ew + 1))
            arr = arr.copy()
            arr[top : top + eh, left : left + ew] = value
            return arr
    return arr


def hflip(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr[:, ::-1])


def _intersection(coord1, coord2):
    """Overlap rectangle of two (top, left, h, w) crops; returns relative
    coords in each crop + absolute coords (reference get_inter,
    src/data.py:232-268)."""
    t1, l1, h1, w1 = coord1
    t2, l2, h2, w2 = coord2
    top = max(t1, t2)
    left = max(l1, l2)
    bot = min(t1 + h1, t2 + h2)
    right = min(l1 + w1, l2 + w2)
    if bot - top <= 0 or right - left <= 0:
        return None, None, None
    hi, wi = bot - top, right - left
    rel1 = (top - t1, left - l1, hi, wi)
    rel2 = (top - t2, left - l2, hi, wi)
    return rel1, rel2, (left, top, hi, wi)


def two_views(
    img: Image.Image, rng: np.random.Generator, view_size: tuple[int, int] = (224, 224)
):
    """Two random overlapping crops + overlap coordinates (reference
    VOC12ImageViews.get_views, src/data.py:272-304).

    Returns (view1 PIL, view2 PIL, rel_coord1, rel_coord2, ori_coord).
    """
    w, h = img.size
    if w < 448 or h < 448:
        img = img.resize((448, 448), resample=BILINEAR)
        w, h = img.size
    th, tw = view_size
    while True:
        i1 = int(rng.integers(0, h - th + 1))
        j1 = int(rng.integers(0, w - tw + 1))
        i2 = int(rng.integers(0, h - th + 1))
        j2 = int(rng.integers(0, w - tw + 1))
        rel1, rel2, ori = _intersection((i1, j1, th, tw), (i2, j2, th, tw))
        if rel1 is not None:
            break
    view1 = img.crop((j1, i1, j1 + tw, i1 + th))
    view2 = img.crop((j2, i2, j2 + tw, i2 + th))
    return view1, view2, rel1, rel2, ori


def cutout(
    arr: np.ndarray,
    mask: np.ndarray,
    rng: np.random.Generator,
    mask_size: int = 66,
    p: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Joint image/mask cutout (reference Cutout, src/imutils.py:390-427):
    zero a mask_size square centred at a random point with prob p."""
    if rng.random() > p:
        return arr, mask
    h, w = arr.shape[:2]
    half = mask_size // 2
    cy = int(rng.integers(0, h + (1 if mask_size % 2 == 0 else 0)))
    cx = int(rng.integers(0, w + (1 if mask_size % 2 == 0 else 0)))
    y0, x0 = max(0, cy - half), max(0, cx - half)
    y1, x1 = min(h, cy - half + mask_size), min(w, cx - half + mask_size)
    arr = arr.copy()
    mask = mask.copy()
    arr[y0:y1, x0:x1] = 0
    mask[y0:y1, x0:x1] = 0
    return arr, mask


def rot90_with_mask(
    arr: np.ndarray, mask: np.ndarray, rng: np.random.Generator
) -> tuple[np.ndarray, np.ndarray]:
    """Random +-90 degree rotation of image+mask, each with prob 1/8
    (reference Rot90WithMask, src/imutils.py:294-306)."""
    p = rng.random()
    if p < 0.125:
        return np.rot90(arr, 1, (0, 1)).copy(), np.rot90(mask, 1, (0, 1)).copy()
    if p > 0.875:
        return np.rot90(arr, 3, (0, 1)).copy(), np.rot90(mask, 3, (0, 1)).copy()
    return arr, mask


def resize_soft_mask(mask: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    """Bilinear resize of an (H, W, C) float soft mask (replaces the
    skimage.transform.resize call at src/imutils.py:52)."""
    th, tw = target_hw
    out = np.empty((th, tw, mask.shape[-1]), np.float32)
    for c in range(mask.shape[-1]):
        im = Image.fromarray(mask[..., c].astype(np.float32), mode="F")
        out[..., c] = np.asarray(im.resize((tw, th), resample=BILINEAR))
    return out
