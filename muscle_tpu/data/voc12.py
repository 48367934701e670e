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
    ):
        super().__init__(name_list, voc12_root, labels)
        self.crop_size = crop_size
        self.view_size = view_size

    def get(self, idx: int, rng: np.random.Generator) -> dict[str, np.ndarray]:
        img = self.image(idx)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        view1, view2, coord1, coord2, _ = T.two_views(img, rng, self.view_size)

        # main branch (train_mcl.py:106-115)
        main = T.random_resize_long(img, 448, 768, rng)
        main = T.color_jitter(main, rng)
        main = T.color_norm(np.asarray(main))
        main = T.random_crop(main, self.crop_size, rng)
        main = T.random_erasing(main, rng)

        def view_tf(v: Image.Image) -> np.ndarray:
            v = T.color_jitter(v, rng)
            return T.color_norm(np.asarray(v))

        return {
            "img": main.astype(np.float32),
            "view1": view_tf(view1).astype(np.float32),
            "view2": view_tf(view2).astype(np.float32),
            "coord1": np.asarray(coord1, np.int32),
            "coord2": np.asarray(coord2, np.int32),
            "label": self.label(idx),
        }


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
    ):
        super().__init__(name_list, voc12_root, labels)
        self.mask_root = mask_root
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.crop_size = crop_size
        self.mask_type = mask_type
        self.num_classes = num_classes

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

        img = T.color_jitter(img, rng, 0.1, 0.1, 0.1, 0.05)
        scale = float(rng.uniform(self.min_scale, self.max_scale))
        w, h = img.size
        tw, th = round(w * scale), round(h * scale)
        img = img.resize((tw, th), resample=T.BILINEAR)
        mask = T.resize_soft_mask(mask, (th, tw))

        arr = T.color_norm(np.asarray(img))
        arr, mask = T.random_crop(arr, self.crop_size, rng, extra=mask)
        if rng.random() < 0.5:
            arr, mask = T.hflip(arr), T.hflip(mask)
        return {
            "img": arr.astype(np.float32),
            "mask": mask.astype(np.float32),
            "label": self.label(idx),
        }
