"""Host data-pipeline tests: transform geometry, determinism, loader."""

import numpy as np
import pytest
from PIL import Image

from muscle_tpu.data import transforms as T
from muscle_tpu.data.loader import PrefetchLoader
from muscle_tpu.data.tta import msf_batch, scaled_size


def _img(w=300, h=200, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


def test_color_norm_roundtrip():
    arr = np.asarray(_img())
    normed = T.color_norm(arr)
    back = T.denorm_to_uint8(normed)
    assert np.abs(back.astype(int) - arr.astype(int)).max() <= 1


def test_random_resize_long_bounds():
    rng = np.random.default_rng(0)
    for _ in range(5):
        out = T.random_resize_long(_img(), 448, 768, rng)
        assert 448 <= max(out.size) <= 768


def test_random_crop_pads_small_images():
    rng = np.random.default_rng(0)
    arr = T.color_norm(np.asarray(_img(100, 80)))
    out = T.random_crop(arr, 224, rng)
    assert out.shape == (224, 224, 3)


def test_two_views_overlap_consistent():
    rng = np.random.default_rng(3)
    img = _img(500, 460)
    v1, v2, c1, c2, ori = T.two_views(img, rng)
    assert v1.size == (224, 224) and v2.size == (224, 224)
    # overlap windows must contain identical pixels
    a1 = np.asarray(v1)[c1[0] : c1[0] + c1[2], c1[1] : c1[1] + c1[3]]
    a2 = np.asarray(v2)[c2[0] : c2[0] + c2[2], c2[1] : c2[1] + c2[3]]
    np.testing.assert_array_equal(a1, a2)


def test_msf_batch_shapes_and_flip():
    imgs = [_img(500, 375), _img(375, 500, seed=1)]
    mb = msf_batch(imgs, ["a", "b"], 0.5)
    assert mb.images.shape[0] == 4
    th, tw = mb.sizes[0]
    assert (tw, th) == scaled_size(500, 375, 0.5)
    # odd index is the horizontal flip of the even index within the window
    np.testing.assert_allclose(
        mb.images[1, :th, :tw], mb.images[0, :th, :tw][:, ::-1], atol=1e-6
    )
    # padding region is zero
    assert np.abs(mb.images[0, th:, :]).sum() == 0


class _ToyDataset:
    def __len__(self):
        return 10

    def get(self, idx, rng):
        return {"x": np.full((3,), idx, np.float32), "r": np.float32(rng.random())}


def test_prefetch_loader_deterministic():
    ds = _ToyDataset()
    l1 = [b for b in PrefetchLoader(ds, 2, seed=7, num_threads=2).epoch(0)]
    l2 = [b for b in PrefetchLoader(ds, 2, seed=7, num_threads=2).epoch(0)]
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["r"], b["r"])
    assert len(l1) == 5 and l1[0]["x"].shape == (2, 3)


def test_prefetch_loader_sharding():
    ds = _ToyDataset()
    seen = []
    for pi in range(2):
        for b in PrefetchLoader(ds, 1, seed=0, shuffle=False, shard=(pi, 2)).epoch(0):
            seen.extend(b["x"][:, 0].tolist())
    assert sorted(seen) == list(map(float, range(10)))


def test_sbd_image_dataset(tmp_path):
    """SBD corpus access (reference SBD/SBDMSF, src/data.py:546-594):
    images by bare name (subdirs allowed), no labels; unit rounds the
    decode size to the nearest multiple."""
    from muscle_tpu.data.voc12 import SBDImageDataset

    d = tmp_path / "img" / "benchmark"
    d.mkdir(parents=True)
    Image.new("RGB", (101, 67), (30, 60, 90)).save(d / "a_0001.jpg")

    ds = SBDImageDataset(["img/benchmark/a_0001"], str(tmp_path))
    assert len(ds) == 1
    assert ds.image(0).size == (101, 67)

    ds8 = SBDImageDataset(["img/benchmark/a_0001"], str(tmp_path), unit=8)
    assert ds8.image(0).size == (104, 64)  # round(101/8)*8, round(67/8)*8

    # MSF variant = the batched TTA producer over .image()s
    batch = msf_batch([ds8.image(0)], ["a_0001"], scale=0.5, canvas=64)
    assert batch.images.shape == (2, 64, 64, 3)
    np.testing.assert_array_equal(batch.sizes[0], (32, 52))
