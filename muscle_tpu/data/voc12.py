"""VOC2012 dataset access (host side).

Capability parity with reference src/data.py's dataset family, reshaped for
a TPU input pipeline: datasets yield fixed-shape float32 numpy batches in
NHWC; all randomness flows through explicit numpy Generators (so per-epoch,
per-host determinism is a seed, not DataLoader worker state).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
from PIL import Image

from muscle_tpu.data import transforms as T

IMG_FOLDER_NAME = "JPEGImages"


def get_img_path(img_name: str, voc12_root: str) -> str:
    return os.path.join(voc12_root, IMG_FOLDER_NAME, img_name + ".jpg")


def load_img_name_list(dataset_path: str) -> list[str]:
    """Image ids from a list file (reference src/data.py:61-67)."""
    with open(dataset_path) as f:
        lines = f.read().splitlines()
    return [l.split(" ")[0].split("/")[-1].split(".")[0] for l in lines if l]


def load_label_dict(cls_labels_path: str) -> dict[str, np.ndarray]:
    """{name: float32[20] multi-hot} (reference data/cls_labels.npy)."""
    return np.load(cls_labels_path, allow_pickle=True).item()


VOC_CAT_LIST = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]

# Per-class instance counts used for inverse-frequency sample weighting
# (reference train_mcl.py:49-50).
VOC_CLASS_COUNTS = [
    590, 504, 705, 468, 714, 393, 1150, 1005, 1228, 267,
    613, 1188, 445, 492, 4155, 522, 300, 649, 503, 567,
]


def load_label_from_xml(img_name: str, voc12_root: str) -> np.ndarray:
    """Multi-hot label from a VOC Annotations XML (reference
    load_image_label_from_xml, src/data.py:29-42) — fallback when
    cls_labels.npy is unavailable; also used to regenerate it."""
    from xml.dom import minidom

    doc = minidom.parse(os.path.join(voc12_root, "Annotations", img_name + ".xml"))
    label = np.zeros(20, np.float32)
    for el in doc.getElementsByTagName("name"):
        name = el.firstChild.data
        if name in VOC_CAT_LIST:
            label[VOC_CAT_LIST.index(name)] = 1.0
    return label


def build_cls_labels(name_list, voc12_root: str, out_path: str) -> dict:
    """Regenerate the cls_labels.npy dict from the VOC XML annotations."""
    d = {n: load_label_from_xml(n, voc12_root) for n in name_list}
    np.save(out_path, d)
    return d


def class_frequency_sample_weights(labels: list[np.ndarray]) -> np.ndarray:
    """Inverse class-instance-count per-image weights (reference
    get_sample_weight, train_mcl.py:46-59): n_images / sum of the instance
    counts of the image's classes)."""
    counts = np.asarray(VOC_CLASS_COUNTS, np.float64)
    n = len(labels)
    weights = np.empty(n, np.float64)
    for i, lab in enumerate(labels):
        inst = counts[np.asarray(lab) > 0].sum()
        weights[i] = n / max(inst, 1.0)
    return weights


@dataclass
class VOC12ImageDataset:
    """Names + PIL images (+ labels if a label dict is given)."""

    name_list: list[str]
    voc12_root: str
    labels: dict[str, np.ndarray] | None = None

    def __len__(self) -> int:
        return len(self.name_list)

    def image(self, idx: int) -> Image.Image:
        return Image.open(get_img_path(self.name_list[idx], self.voc12_root)).convert("RGB")

    def label(self, idx: int) -> np.ndarray:
        assert self.labels is not None
        return np.asarray(self.labels[self.name_list[idx]], np.float32)


@dataclass
class SBDImageDataset:
    """Labelless image corpus addressed by an explicit name list
    (reference SBD / SBDMSF, src/data.py:546-594): images live at
    ``<root>/<name>.jpg`` (names may carry subdirectories) with no
    cls_labels entry.  ``unit`` rounds each image's size to the nearest
    multiple before scaling (the reference SBDMSF ``unit`` parameter,
    applied here at decode so the batched TTA producer
    muscle_tpu.data.tta.msf_batch — the MSF variant — needs no special
    case; for unit=1, the reference default, the two formulations are
    identical, and otherwise they differ only by the extra resample)."""

    name_list: list[str]
    root: str
    unit: int = 1

    def __len__(self) -> int:
        return len(self.name_list)

    def image(self, idx: int) -> Image.Image:
        img = Image.open(
            os.path.join(self.root, self.name_list[idx] + ".jpg")
        ).convert("RGB")
        if self.unit > 1:
            w, h = img.size
            rw = max(self.unit, int(round(w / self.unit) * self.unit))
            rh = max(self.unit, int(round(h / self.unit) * self.unit))
            if (rw, rh) != (w, h):
                img = img.resize((rw, rh), resample=T.BICUBIC)
        return img


class VOC12ClsPixDataset(VOC12ImageDataset):
    """MCL training set: augmented full image + two overlapping views with
    overlap coordinates (reference VOC12ClsPix, src/data.py:215-332).

    __getitem__(idx, rng) -> dict of fixed-shape float32 arrays:
      img (crop, crop, 3), view1/view2 (224, 224, 3),
      coord1/coord2 (4,) int32, label (20,).
    """

    def __init__(
        self,
        name_list,
        voc12_root,
        labels,
        crop_size: int = 448,
        view_size: tuple[int, int] = (224, 224),
        device_norm: bool = False,
        upload: str = "rgb",
    ):
        super().__init__(name_list, voc12_root, labels)
        self.crop_size = crop_size
        self.view_size = view_size
        # device_norm: emit uint8 images (4x less host->device traffic);
        # the train steps normalise on device (training/mcl.py
        # norm_on_device).  Pad/erase regions use the nearest-uint8
        # ImageNet mean instead of the reference's normalised-space zero
        # (|delta| <= 0.009 in those pixels only; everything else is the
        # identical value pre-quantisation).  Same rng draw sequence as
        # the f32 path, so curricula are reproducible across modes.
        self.device_norm = device_norm
        # upload='ycbcr420' (device_norm only): ship each crop as full-res
        # luma + 2x2 box-subsampled chroma planes ({key}_y/{key}_c) —
        # half the bytes over the host->device link, which bounds the
        # training step (core/ycbcr.py rationale + deviation bound).
        if upload not in ("rgb", "ycbcr420"):
            raise ValueError(f"upload must be 'rgb' or 'ycbcr420', got {upload!r}")
        if upload == "ycbcr420" and not device_norm:
            raise ValueError("upload='ycbcr420' requires device_norm=True")
        if upload == "ycbcr420" and (
            crop_size % 2 or view_size[0] % 2 or view_size[1] % 2
        ):
            # fail at construction, not at the first batch inside a
            # PrefetchLoader worker (rgb_to_ycbcr420 needs even sides)
            raise ValueError(
                f"upload='ycbcr420' needs even crop_size/view_size, got "
                f"{crop_size}/{view_size}"
            )
        self.upload = upload

    def get(self, idx: int, rng: np.random.Generator) -> dict[str, np.ndarray]:
        img = self.image(idx)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        view1, view2, coord1, coord2, _ = T.two_views(img, rng, self.view_size)

        # main branch (train_mcl.py:106-115)
        main = T.random_resize_long(img, 448, 768, rng)
        main = T.color_jitter(main, rng)
        if self.device_norm:
            main = np.asarray(main)
            fill = T.IMAGENET_MEAN_U8
            main = T.random_crop(main, self.crop_size, rng, fill=fill)
            main = T.random_erasing(main, rng, value=fill)

            def view_tf(v: Image.Image) -> np.ndarray:
                return np.asarray(T.color_jitter(v, rng), np.uint8)

            out_dtype = np.uint8
        else:
            main = T.color_norm(np.asarray(main))
            main = T.random_crop(main, self.crop_size, rng)
            main = T.random_erasing(main, rng)

            def view_tf(v: Image.Image) -> np.ndarray:
                v = T.color_jitter(v, rng)
                return T.color_norm(np.asarray(v))

            out_dtype = np.float32

        out = {
            "img": main.astype(out_dtype),
            "view1": view_tf(view1).astype(out_dtype),
            "view2": view_tf(view2).astype(out_dtype),
            "coord1": np.asarray(coord1, np.int32),
            "coord2": np.asarray(coord2, np.int32),
            "label": self.label(idx),
        }
        if self.upload == "ycbcr420":
            from muscle_tpu.core.ycbcr import rgb_to_ycbcr420

            for k in ("img", "view1", "view2"):
                out[k + "_y"], out[k + "_c"] = rgb_to_ycbcr420(out.pop(k))
        return out


class VOC12AffinityDataset(VOC12ImageDataset):
    """IRN training set: crop-padded image + path-pair affinity masks
    derived from pseudo-label PNGs (capability of the reference's
    IRN-lineage datasets, src/data.py:445-754, re-designed: the affinity
    targets are produced directly in the (D, P) layout the TPU loss
    consumes)."""

    def __init__(
        self,
        name_list,
        voc12_root,
        labels,
        pseudo_label_root: str,
        crop_size: int = 512,
        stride: int = 4,
        radius: int = 5,
        min_scale: float = 0.5,
        max_scale: float = 1.5,
        device_norm: bool = False,
        upload: str = "rgb",
        pack_bits: bool = False,
    ):
        super().__init__(name_list, voc12_root, labels)
        self.pseudo_label_root = pseudo_label_root
        self.crop_size = crop_size
        self.stride = stride
        self.radius = radius
        self.min_scale = min_scale
        self.max_scale = max_scale
        # device_norm: uint8 image + 0/1 uint8 affinity masks, decoded on
        # device by irn_train_step (~16x less host->device traffic; the
        # masks are exact, the image pad fill deviates <= 0.009 normalised
        # — see VOC12ClsPixDataset)
        self.device_norm = device_norm
        # upload='ycbcr420': img ships as luma + 2x2-subsampled chroma
        # planes (half the image bytes; core/ycbcr.py bound).  pack_bits:
        # the 0/1 (D, P) masks ship 8 pairs/byte (core/bitpack.py — EXACT;
        # irn_train_step unpacks on device by the P//8 trailing dim).
        if upload not in ("rgb", "ycbcr420"):
            raise ValueError(f"upload must be 'rgb' or 'ycbcr420', got {upload!r}")
        if (upload == "ycbcr420" or pack_bits) and not device_norm:
            raise ValueError("upload='ycbcr420'/pack_bits require device_norm=True")
        if upload == "ycbcr420" and crop_size % 2:
            raise ValueError(
                f"upload='ycbcr420' needs an even crop_size, got {crop_size}"
            )
        self.upload = upload
        self.pack_bits = bool(pack_bits)
        from muscle_tpu.ops.random_walk import PathIndex

        g = crop_size // stride
        self._pi = PathIndex(radius, (g, g))
        if self.pack_bits and self._pi.src_indices.size % 8:
            raise ValueError(
                f"pack_bits needs the pair-grid width P="
                f"{self._pi.src_indices.size} divisible by 8 — use "
                "pack_bits=False for this crop_size/stride/radius"
            )

    def get(self, idx: int, rng: np.random.Generator) -> dict[str, np.ndarray]:
        name = self.name_list[idx]
        img = self.image(idx)
        lab = Image.open(os.path.join(self.pseudo_label_root, name + ".png"))

        scale = float(rng.uniform(self.min_scale, self.max_scale))
        tw, th = round(img.size[0] * scale), round(img.size[1] * scale)
        img = img.resize((tw, th), resample=T.BILINEAR)
        lab = lab.resize((tw, th), resample=Image.NEAREST)

        if self.device_norm:
            arr = np.asarray(img)
            canvas = np.full(
                (self.crop_size, self.crop_size, 3), T.IMAGENET_MEAN_U8, np.uint8
            )
        else:
            arr = T.color_norm(np.asarray(img))
            canvas = np.zeros((self.crop_size, self.crop_size, 3), np.float32)
        lab_arr = np.asarray(lab)
        cs = self.crop_size
        lab_canvas = np.full((cs, cs), 255, np.uint8)  # pad = void
        ch, cw = min(th, cs), min(tw, cs)
        top = int(rng.integers(0, max(th - cs, 0) + 1))
        left = int(rng.integers(0, max(tw - cs, 0) + 1))
        canvas[:ch, :cw] = arr[top : top + ch, left : left + cw]
        lab_canvas[:ch, :cw] = lab_arr[top : top + ch, left : left + cw]
        if rng.random() < 0.5:
            canvas = T.hflip(canvas)
            lab_canvas = np.ascontiguousarray(lab_canvas[:, ::-1])

        # nearest downsample to the stride-4 affinity grid
        small = lab_canvas[self.stride // 2 :: self.stride, self.stride // 2 :: self.stride]
        bg_pos, fg_pos, neg = self._affinity_masks(small)
        if self.device_norm:
            out = {
                "img": canvas,
                "bg_pos": bg_pos.astype(np.uint8),
                "fg_pos": fg_pos.astype(np.uint8),
                "neg": neg.astype(np.uint8),
            }
            if self.pack_bits:
                from muscle_tpu.core.bitpack import packbits_last

                for k in ("bg_pos", "fg_pos", "neg"):
                    out[k] = packbits_last(out[k])
            if self.upload == "ycbcr420":
                from muscle_tpu.core.ycbcr import rgb_to_ycbcr420

                out["img_y"], out["img_c"] = rgb_to_ycbcr420(out.pop("img"))
            return out
        return {
            "img": canvas,
            "bg_pos": bg_pos,
            "fg_pos": fg_pos,
            "neg": neg,
        }

    def _affinity_masks(self, small: np.ndarray):
        pi = self._pi
        flat = small.reshape(-1).astype(np.int32)
        src = np.broadcast_to(pi.src_indices[None, :], pi.dst_indices.shape)
        a = flat[src]
        b = flat[pi.dst_indices]
        valid = (a != 255) & (b != 255)
        equal = (a == b) & valid
        return (
            (equal & (a == 0)).astype(np.float32),
            (equal & (a > 0)).astype(np.float32),
            ((a != b) & valid).astype(np.float32),
        )


class VOC12SegDataset(VOC12ImageDataset):
    """Segmentation training set: image + soft/hard pseudo mask with joint
    augmentation (reference VOC12SegDataset, src/data.py:69-123)."""

    def __init__(
        self,
        name_list,
        voc12_root,
        labels,
        mask_root: str,
        min_scale: float = 0.5,
        max_scale: float = 1.75,
        crop_size: int = 448,
        mask_type: str = "soft",
        num_classes: int = 21,
        device_norm: bool = False,
        pack_mask: int = 0,
        upload: str = "rgb",
    ):
        super().__init__(name_list, voc12_root, labels)
        self.mask_root = mask_root
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.crop_size = crop_size
        self.mask_type = mask_type
        self.num_classes = num_classes
        # device_norm: ship uint8 images AND x255-quantised uint8 soft
        # masks (16x less host->device traffic than f32 img + f32 mask);
        # seg_train_step dequantises/normalises on device.  Bounded
        # deviations: image pad fill |delta| <= 0.009 normalised (see
        # VOC12ClsPixDataset) and mask values quantised to 1/255 (CE
        # argmax can flip only between classes within 1/255 of each
        # other; BEACON similarities shift O(0.4%)).
        self.device_norm = device_norm
        # pack_mask: ship only the mask channels that can be nonzero.  The
        # walk pseudo-masks (cli/infer_irn.py, reference infer_irn.py:68-82)
        # zero every foreground class outside the image's GT label set, so
        # a (H, W, K) slice of K = 1 + #labels channels plus a (K,) channel
        # index vector is an EXACT re-encoding of the (H, W, 21) stack —
        # seg_train_step scatters it back on device before any loss touches
        # it.  Cuts the mask's share of the host->device bytes ~21/K-fold
        # (the mask is ~87% of the batch) and the host-side per-channel
        # resize the same way.  K > 0: fixed channel budget, raises loudly
        # if any mask has more nonzero channels (no silent class drops);
        # -1: size K from the dataset's own labels; 0: dense (H, W, 21).
        if pack_mask == -1:
            pack_mask = 1 + max(
                1, max(int(self.label(i).sum()) for i in range(len(name_list)))
            )
        self.pack_mask = int(pack_mask)
        # upload='ycbcr420' (device_norm only): img ships as full-res luma
        # + 2x2-subsampled chroma (half the image bytes; core/ycbcr.py
        # bound) — with pack_mask the image is the dominant batch share.
        if upload not in ("rgb", "ycbcr420"):
            raise ValueError(f"upload must be 'rgb' or 'ycbcr420', got {upload!r}")
        if upload == "ycbcr420" and not device_norm:
            raise ValueError("upload='ycbcr420' requires device_norm=True")
        if upload == "ycbcr420" and crop_size % 2:
            raise ValueError(
                f"upload='ycbcr420' needs an even crop_size, got {crop_size}"
            )
        self.upload = upload

    def _pack_mask(self, mask: np.ndarray, name: str):
        """(H, W, C) -> ((H, W, k<=K) active-channel slice, (K,) int32
        channel ids, zero-padded).  Channel 0 (bg) is always kept so the
        zero-pad index 0 scatters zeros onto a channel that exists."""
        k = self.pack_mask
        nz = np.flatnonzero((mask != 0).any(axis=(0, 1)))
        active = nz if (nz.size and nz[0] == 0) else np.concatenate(([0], nz))
        if active.size > k:
            raise ValueError(
                f"pack_mask={k} but {name} has {active.size} nonzero mask "
                f"channels {active.tolist()} — raise pack_mask or use "
                "pack_mask=0 (dense)"
            )
        idx = np.zeros(k, np.int32)
        idx[: active.size] = active
        return mask[..., active], idx

    def _load_mask(self, name: str) -> np.ndarray:
        if self.mask_type == "hard":
            m = np.array(Image.open(os.path.join(self.mask_root, name + ".png")))
            onehot = np.zeros((*m.shape, self.num_classes), np.float32)
            valid = m < self.num_classes
            onehot[valid, m[valid]] = 1.0
            return onehot
        return np.load(os.path.join(self.mask_root, name + ".npy"), allow_pickle=True).astype(
            np.float32
        )

    def get(self, idx: int, rng: np.random.Generator) -> dict[str, np.ndarray]:
        name = self.name_list[idx]
        img = self.image(idx)
        mask = self._load_mask(name)  # (H, W, C)
        mask_idx = None
        if self.pack_mask:
            # pack BEFORE the geometric aug: the per-channel resize then
            # runs on k channels instead of 21 (exact — resizing/cropping
            # an all-zero channel yields zeros, and the rng draw sequence
            # below never depends on the channel count)
            mask, mask_idx = self._pack_mask(mask, name)

        img = T.color_jitter(img, rng, 0.1, 0.1, 0.1, 0.05)
        scale = float(rng.uniform(self.min_scale, self.max_scale))
        w, h = img.size
        tw, th = round(w * scale), round(h * scale)
        img = img.resize((tw, th), resample=T.BILINEAR)
        mask = T.resize_soft_mask(mask, (th, tw))

        if self.device_norm:
            arr, mask = T.random_crop(
                np.asarray(img), self.crop_size, rng, extra=mask,
                fill=T.IMAGENET_MEAN_U8,
            )
        else:
            arr = T.color_norm(np.asarray(img))
            arr, mask = T.random_crop(arr, self.crop_size, rng, extra=mask)
        if rng.random() < 0.5:
            arr, mask = T.hflip(arr), T.hflip(mask)
        if mask_idx is not None and mask.shape[-1] < self.pack_mask:
            mask = np.pad(
                mask, ((0, 0), (0, 0), (0, self.pack_mask - mask.shape[-1]))
            )
        if self.device_norm:
            out = {
                "img": arr.astype(np.uint8),
                "mask": np.round(np.clip(mask, 0.0, 1.0) * 255.0).astype(np.uint8),
                "label": self.label(idx),
            }
            if self.upload == "ycbcr420":
                from muscle_tpu.core.ycbcr import rgb_to_ycbcr420

                out["img_y"], out["img_c"] = rgb_to_ycbcr420(out.pop("img"))
        else:
            out = {
                "img": arr.astype(np.float32),
                "mask": mask.astype(np.float32),
                "label": self.label(idx),
            }
        if mask_idx is not None:
            out["mask_idx"] = mask_idx
        return out
