"""Host dataset classes + CLI end-to-end on a synthetic miniature VOC tree."""

import os

import numpy as np
import pytest
from PIL import Image

from muscle_tpu.data import (
    PrefetchLoader,
    VOC12AffinityDataset,
    VOC12ClsPixDataset,
    VOC12SegDataset,
    build_cls_labels,
)


@pytest.fixture(scope="module")
def mini_voc(tmp_path_factory):
    """JPEGImages + SegmentationClass + Annotations + lists + cls_labels."""
    root = tmp_path_factory.mktemp("voc")
    img_dir = root / "JPEGImages"
    seg_dir = root / "SegmentationClass"
    ann_dir = root / "Annotations"
    for d in (img_dir, seg_dir, ann_dir):
        os.makedirs(d)
    rng = np.random.default_rng(0)
    names = [f"2007_{i:06d}" for i in range(4)]
    cats = ["aeroplane", "cat", "dog", "person"]
    for i, n in enumerate(names):
        h, w = 60 + 4 * i, 80 - 4 * i
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            img_dir / f"{n}.jpg"
        )
        seg = np.zeros((h, w), np.uint8)
        seg[10:30, 10:30] = i + 1
        Image.fromarray(seg).save(seg_dir / f"{n}.png")
        (ann_dir / f"{n}.xml").write_text(
            f"<annotation><object><name>{cats[i]}</name></object></annotation>"
        )
    (root / "list.txt").write_text("\n".join(names) + "\n")
    build_cls_labels(names, str(root), str(root / "cls_labels.npy"))
    return root, names


def test_build_cls_labels_from_xml(mini_voc):
    root, names = mini_voc
    d = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    assert d[names[0]][0] == 1.0  # aeroplane
    assert d[names[1]][7] == 1.0  # cat
    assert d[names[0]].sum() == 1.0


def test_cls_pix_dataset_shapes(mini_voc):
    root, names = mini_voc
    labels = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    ds = VOC12ClsPixDataset(names, str(root), labels, crop_size=64, view_size=(32, 32))
    rng = np.random.default_rng(0)
    s = ds.get(0, rng)
    assert s["img"].shape == (64, 64, 3)
    assert s["view1"].shape == (32, 32, 3) and s["view2"].shape == (32, 32, 3)
    assert s["coord1"].shape == (4,) and s["coord2"].shape == (4,)
    # overlap rectangles have identical extents in both views
    assert tuple(s["coord1"][2:]) == tuple(s["coord2"][2:])
    loader = PrefetchLoader(ds, 2, seed=0, num_threads=2)
    batch = next(iter(loader.epoch(0)))
    assert batch["img"].shape == (2, 64, 64, 3)


def test_seg_dataset_with_soft_masks(mini_voc, tmp_path):
    root, names = mini_voc
    labels = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    mask_dir = tmp_path / "masks"
    os.makedirs(mask_dir)
    rng = np.random.default_rng(0)
    for n in names:
        img = Image.open(root / "JPEGImages" / f"{n}.jpg")
        w, h = img.size
        soft = rng.uniform(0, 1, (h, w, 21)).astype(np.float16)
        np.save(mask_dir / f"{n}.npy", soft)
    ds = VOC12SegDataset(names, str(root), labels, str(mask_dir), crop_size=48)
    s = ds.get(1, np.random.default_rng(1))
    assert s["img"].shape == (48, 48, 3)
    assert s["mask"].shape == (48, 48, 21)


def test_affinity_dataset(mini_voc):
    root, names = mini_voc
    labels = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    ds = VOC12AffinityDataset(
        names, str(root), labels, str(root / "SegmentationClass"), crop_size=64
    )
    s = ds.get(0, np.random.default_rng(0))
    assert s["img"].shape == (64, 64, 3)
    d = s["bg_pos"].shape[0]
    assert s["fg_pos"].shape == s["bg_pos"].shape == s["neg"].shape
    assert ((s["bg_pos"] + s["fg_pos"] + s["neg"]) <= 1.0).all()


def test_cam_to_label_cli(mini_voc, tmp_path):
    """SGC dicts -> hard pseudo-label PNGs with a void band, consumable by
    the affinity dataset (the train_irn input producer)."""
    from muscle_tpu.cli import cam_to_label

    root, names = mini_voc
    cam_dir = tmp_path / "cam_sgc"
    os.makedirs(cam_dir)
    cls_of = [0, 7, 11, 14]
    for i, n in enumerate(names):
        img = Image.open(root / "JPEGImages" / f"{n}.jpg")
        w, h = img.size
        m = np.zeros((h, w), np.float16)
        m[10:30, 10:30] = 0.9  # confident blob matching the seg fixture
        np.save(cam_dir / f"{n}.npy", {cls_of[i]: m})

    out_dir = tmp_path / "cam_png"
    cam_to_label.main([
        "--cam_dir", str(cam_dir),
        "--out_dir", str(out_dir),
        "--infer_list", str(root / "list.txt"),
        "--voc12_root", str(root),
        "--cls_labels", str(root / "cls_labels.npy"),
    ])
    for i, n in enumerate(names):
        lab = np.array(Image.open(out_dir / f"{n}.png"))
        img = Image.open(root / "JPEGImages" / f"{n}.jpg")
        assert lab.shape == (img.size[1], img.size[0])
        assert set(np.unique(lab)) <= {0, cls_of[i] + 1, 255}
        # the confident blob survives as foreground somewhere
        assert (lab == cls_of[i] + 1).sum() > 0

    labels = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    ds = VOC12AffinityDataset(names, str(root), labels, str(out_dir), crop_size=64)
    s = ds.get(0, np.random.default_rng(0))
    assert s["img"].shape == (64, 64, 3)


@pytest.mark.slow
def test_train_mcl_cli_one_epoch(mini_voc, tmp_path):
    """One epoch of the MCL training CLI on the mini VOC: loader, train
    step, checkpointing, rapid eval with threshold sweep, plateau step."""
    from muscle_tpu.cli import train_mcl

    root, names = mini_voc
    session = tmp_path / "session"
    train_mcl.main([
        "--train_list", str(root / "list.txt"),
        "--eval_list", str(root / "list.txt"),
        "--voc12_root", str(root),
        "--cls_labels", str(root / "cls_labels.npy"),
        "--session_name", str(session),
        "--log_dir", str(tmp_path / "logs"),
        "--backbone", "efficientnet-b1",
        "--batch_size", "2",
        "--max_epoches", "1",
        "--crop_size", "64",
    ])
    assert (session / "model_0.msgpack").exists()
    assert (session / "step_0").exists()
    log = (tmp_path / "logs" / "metrics.jsonl").read_text()
    assert "loss_focal" in log
    # observability: CAM/SGC overlay PNGs stream under <log_dir>/vis
    vis = list((tmp_path / "logs" / "vis").glob("step*_cls*_sgc.png"))
    assert vis, "training visualizer produced no overlay PNGs"
    # tensorboard event stream (utils/tb_events.py; reference tblogger)
    ev = list((tmp_path / "logs" / "tb").glob("events.out.tfevents.*"))
    assert ev and ev[0].stat().st_size > 0, "no tensorboard event file"

    # artifact chain: the trained checkpoint drives the CAM inference CLI
    from muscle_tpu.cli import infer_mcl

    out = tmp_path / "cams_from_ckpt"
    infer_mcl.main([
        "--weights", str(session / "model_0.msgpack"),
        "--infer_list", str(root / "list.txt"),
        "--voc12_root", str(root),
        "--cls_labels", str(root / "cls_labels.npy"),
        "--out_npy", str(out),
        "--backbone", "efficientnet-b1",
        "--scales", "1",
        "--batch_size", "4",
    ])
    d = np.load(str(out) + "_sgc/" + names[0] + ".npy", allow_pickle=True).item()
    assert next(iter(d.values())).dtype == np.float16


@pytest.mark.slow
def test_infer_mcl_cli_end_to_end(mini_voc, tmp_path, monkeypatch):
    """The CAM CLI writes reference-format npy dicts from a mini VOC."""
    import jax

    root, names = mini_voc
    # tiny random .msgpack checkpoint for the b1 backbone
    import flax.serialization
    import jax.numpy as jnp

    from muscle_tpu.models import MuSCLe

    model = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)), mode="cam"
    )
    ckpt = tmp_path / "model_0.msgpack"
    ckpt.write_bytes(flax.serialization.to_bytes(jax.device_get(variables)))

    from muscle_tpu.cli import infer_mcl

    out = tmp_path / "cams"
    infer_mcl.main([
        "--weights", str(ckpt),
        "--infer_list", str(root / "list.txt"),
        "--voc12_root", str(root),
        "--cls_labels", str(root / "cls_labels.npy"),
        "--out_npy", str(out),
        "--backbone", "efficientnet-b1",
        "--scales", "0.5,1",
        "--batch_size", "4",
    ])
    for i, n in enumerate(names):
        d = np.load(str(out) + "_sgc/" + n + ".npy", allow_pickle=True).item()
        img = Image.open(root / "JPEGImages" / f"{n}.jpg")
        w, h = img.size
        assert set(d.keys()) == {[0, 7, 11, 14][i]}
        m = next(iter(d.values()))
        assert m.shape == (h, w) and m.dtype == np.float16

    # --spatial 4: (2 data, 4 model) mesh, GSPMD halo convs — same
    # reference-format outputs, numerically close to the pure-DP run
    out_sp = tmp_path / "cams_sp"
    infer_mcl.main([
        "--weights", str(ckpt),
        "--infer_list", str(root / "list.txt"),
        "--voc12_root", str(root),
        "--cls_labels", str(root / "cls_labels.npy"),
        "--out_npy", str(out_sp),
        "--backbone", "efficientnet-b1",
        "--scales", "0.5,1",
        "--batch_size", "4",
        "--spatial", "4",
    ])
    for n in names:
        d0 = np.load(str(out) + "_sgc/" + n + ".npy", allow_pickle=True).item()
        d1 = np.load(str(out_sp) + "_sgc/" + n + ".npy", allow_pickle=True).item()
        assert set(d0.keys()) == set(d1.keys())
        for c in d0:
            # fast mode downloads uint8: one quantisation bin (1/255) of
            # slack for the spatial path's float reassociation
            np.testing.assert_allclose(
                d0[c].astype(np.float32), d1[c].astype(np.float32), atol=5e-3
            )


def test_cls_pix_dataset_device_norm_parity(mini_voc):
    """The uint8 (device-norm) pipeline must equal the f32 pipeline after
    on-device normalisation, except pad/erase fills (|delta| <= 0.0095) —
    same rng draw sequence, so the random geometry is identical."""
    from muscle_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    root, names = mini_voc
    labels = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    kw = dict(crop_size=64, view_size=(32, 32))
    ds_f = VOC12ClsPixDataset(names, str(root), labels, **kw)
    ds_u = VOC12ClsPixDataset(names, str(root), labels, device_norm=True, **kw)
    for idx in range(3):
        a = ds_f.get(idx, np.random.default_rng(7 + idx))
        b = ds_u.get(idx, np.random.default_rng(7 + idx))
        assert b["img"].dtype == np.uint8
        assert b["view1"].dtype == np.uint8
        np.testing.assert_array_equal(a["coord1"], b["coord1"])
        np.testing.assert_array_equal(a["coord2"], b["coord2"])
        for k in ("img", "view1", "view2"):
            dev = ((b[k].astype(np.float64) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
            delta = np.abs(dev - a[k].astype(np.float64))
            # exact where pixels came straight from the image; <= half a
            # uint8 step (normalised) in pad/erase fills
            assert float(delta.max()) <= 0.5 / 255.0 / IMAGENET_STD.min() + 1e-6


def test_mcl_train_step_accepts_uint8(mini_voc):
    """norm_on_device: a uint8 batch must produce the same loss as the
    equivalent host-normalised f32 batch."""
    import jax
    import jax.numpy as jnp

    from muscle_tpu.data.transforms import color_norm
    from muscle_tpu.models import MuSCLe
    from muscle_tpu.training import MCLConfig, create_train_state, mcl_train_step
    from muscle_tpu.training.state import make_adam

    model = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)), mode="cam"
    )
    tx = make_adam(1e-4, 5e-5)
    rng_np = np.random.default_rng(0)
    img_u8 = rng_np.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    label = np.zeros((2, 20), np.float32)
    label[0, 3] = label[1, 5] = 1.0
    img_f32 = np.stack([color_norm(im) for im in img_u8])
    rng = jax.random.key(1)
    cfg = MCLConfig()
    losses = []
    for img in (img_u8, img_f32):
        # fresh buffers per run: the step donates the state, whose arrays
        # alias `variables`
        state = create_train_state(jax.tree.map(jnp.array, variables), tx)
        state, metrics = mcl_train_step(
            model, tx, state, {"img": img, "label": label}, rng, cfg
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-5)


def test_seg_dataset_device_norm_parity(mini_voc, tmp_path):
    """uint8 seg pipeline == f32 pipeline after on-device decode: images
    match except pad fill; masks match to the 1/255 quantisation step."""
    from muscle_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    root, names = mini_voc
    labels = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    mask_dir = tmp_path / "masks_dn"
    os.makedirs(mask_dir)
    rng = np.random.default_rng(0)
    for n in names:
        img = Image.open(root / "JPEGImages" / f"{n}.jpg")
        w, h = img.size
        np.save(mask_dir / f"{n}.npy", rng.uniform(0, 1, (h, w, 21)).astype(np.float16))
    kw = dict(crop_size=48)
    ds_f = VOC12SegDataset(names, str(root), labels, str(mask_dir), **kw)
    ds_u = VOC12SegDataset(names, str(root), labels, str(mask_dir), device_norm=True, **kw)
    for idx in range(2):
        a = ds_f.get(idx, np.random.default_rng(3 + idx))
        b = ds_u.get(idx, np.random.default_rng(3 + idx))
        assert b["img"].dtype == np.uint8 and b["mask"].dtype == np.uint8
        dev = ((b["img"].astype(np.float64) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
        assert float(np.abs(dev - a["img"]).max()) <= 0.5 / 255.0 / IMAGENET_STD.min() + 1e-6
        assert float(np.abs(b["mask"] / 255.0 - a["mask"]).max()) <= 0.5 / 255.0 + 1e-6


def test_seg_train_step_accepts_uint8(mini_voc):
    import jax
    import jax.numpy as jnp

    from muscle_tpu.data.transforms import color_norm
    from muscle_tpu.models import MuSCLe
    from muscle_tpu.training import SegConfig, create_train_state, seg_train_step
    from muscle_tpu.training.state import make_adam

    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True
    )
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)), mode="seg"
    )
    tx = make_adam(1e-5, 1e-5)
    rng_np = np.random.default_rng(0)
    img_u8 = rng_np.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    mask_u8 = rng_np.integers(0, 256, (2, 64, 64, 21)).astype(np.uint8)
    label = np.zeros((2, 20), np.float32)
    label[0, 3] = label[1, 5] = 1.0
    rng = jax.random.key(1)
    cfg = SegConfig(k=16, step=3)
    losses = []
    for batch in (
        {"img": img_u8, "mask": mask_u8, "label": label},
        {
            "img": np.stack([color_norm(im) for im in img_u8]),
            "mask": mask_u8.astype(np.float32) / 255.0,
            "label": label,
        },
    ):
        state = create_train_state(jax.tree.map(jnp.array, variables), tx)
        state, metrics = seg_train_step(model, tx, state, batch, rng, cfg)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-5)


def test_affinity_dataset_device_norm_parity(mini_voc):
    from muscle_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    root, names = mini_voc
    labels = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    kw = dict(crop_size=64)
    ds_f = VOC12AffinityDataset(
        names, str(root), labels, str(root / "SegmentationClass"), **kw
    )
    ds_u = VOC12AffinityDataset(
        names, str(root), labels, str(root / "SegmentationClass"),
        device_norm=True, **kw,
    )
    a = ds_f.get(0, np.random.default_rng(5))
    b = ds_u.get(0, np.random.default_rng(5))
    assert b["img"].dtype == np.uint8
    dev = ((b["img"].astype(np.float64) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
    assert float(np.abs(dev - a["img"]).max()) <= 0.5 / 255.0 / IMAGENET_STD.min() + 1e-6
    for k in ("bg_pos", "fg_pos", "neg"):
        assert b[k].dtype == np.uint8
        np.testing.assert_array_equal(a[k], b[k].astype(np.float32))


def test_ycbcr420_training_roundtrip():
    """core/ycbcr.py pack -> decode inverts within the chroma bound:
    grayscale exactly (chroma constant 128), smooth color gradients to a
    few uint8 steps (box-subsample + bilinear on slowly varying chroma)."""
    from muscle_tpu.core.ycbcr import rgb_to_ycbcr420, ycbcr420_to_rgb

    # grayscale ramp: Y == value (BT.601 coeffs sum to 1), Cb = Cr = 128
    g = np.tile(np.arange(64, dtype=np.uint8)[:, None, None], (1, 64, 3))
    y, c = rgb_to_ycbcr420(g)
    assert y.shape == (64, 64) and y.dtype == np.uint8
    assert c.shape == (32, 32, 2) and c.dtype == np.uint8
    rec = np.asarray(ycbcr420_to_rgb(y[None], c[None]))[0]
    assert float(np.abs(rec - g.astype(np.float32)).max()) <= 1.0 + 1e-5

    # smooth color gradient: interior reproduces the ramp; border rows of
    # the chroma upsample clamp (half-pixel edge), still a few steps
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    sm = np.stack([2 * xx, 2 * yy, xx + yy], -1).astype(np.uint8)
    y, c = rgb_to_ycbcr420(sm)
    rec = np.asarray(ycbcr420_to_rgb(y[None], c[None]))[0]
    assert float(np.abs(rec - sm.astype(np.float32)).max()) <= 6.0
    assert float(np.abs(rec - sm.astype(np.float32)).mean()) <= 1.5

    # odd sides must be rejected (training crops are always even)
    with pytest.raises(ValueError):
        rgb_to_ycbcr420(np.zeros((63, 64, 3), np.uint8))


def test_cls_pix_dataset_ycbcr_upload(mini_voc):
    """upload='ycbcr420': same geometry/labels as the uint8 RGB pipeline
    (same rng draws), planes carry PIL's exact Y + box-subsampled chroma."""
    from PIL import Image as PILImage

    root, names = mini_voc
    labels = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    kw = dict(crop_size=64, view_size=(32, 32), device_norm=True)
    ds_u = VOC12ClsPixDataset(names, str(root), labels, **kw)
    ds_y = VOC12ClsPixDataset(names, str(root), labels, upload="ycbcr420", **kw)
    for idx in range(2):
        a = ds_u.get(idx, np.random.default_rng(3 + idx))
        b = ds_y.get(idx, np.random.default_rng(3 + idx))
        assert set(b) == {
            "img_y", "img_c", "view1_y", "view1_c", "view2_y", "view2_c",
            "coord1", "coord2", "label",
        }
        assert b["img_y"].shape == (64, 64) and b["img_y"].dtype == np.uint8
        assert b["img_c"].shape == (32, 32, 2)
        assert b["view1_y"].shape == (32, 32) and b["view1_c"].shape == (16, 16, 2)
        np.testing.assert_array_equal(a["coord1"], b["coord1"])
        np.testing.assert_array_equal(a["coord2"], b["coord2"])
        np.testing.assert_array_equal(a["label"], b["label"])
        # luma plane is exactly PIL's Y of the identical RGB crop
        ref_y = np.asarray(
            PILImage.fromarray(a["img"], "RGB").convert("YCbCr").split()[0]
        )
        np.testing.assert_array_equal(b["img_y"], ref_y)

    # ycbcr420 without device_norm has no on-device decode consumer
    with pytest.raises(ValueError):
        VOC12ClsPixDataset(
            names, str(root), labels, crop_size=64, upload="ycbcr420"
        )


def test_mcl_train_step_accepts_ycbcr():
    """decode_image: a ycbcr420 batch with NEUTRAL chroma planes (Cb = Cr
    = 128 exactly -> the bilinear upsample is the constant 128 and the
    BT.601 decode is the identity on luma) must produce the same loss as
    the equivalent grayscale uint8 RGB batch.  Constructing the planes
    directly keeps the comparison bit-exact — PIL's integer RGB->YCbCr
    pack rounds per pixel (covered by the roundtrip/dataset tests above),
    which would add a ~1-step noise floor here."""
    import jax
    import jax.numpy as jnp

    from muscle_tpu.models import MuSCLe
    from muscle_tpu.training import MCLConfig, create_train_state, mcl_train_step
    from muscle_tpu.training.state import make_adam

    model = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)), mode="cam"
    )
    tx = make_adam(1e-4, 5e-5)
    rng_np = np.random.default_rng(0)
    gray = rng_np.integers(0, 256, (2, 64, 64, 1)).astype(np.uint8)
    img_u8 = np.repeat(gray, 3, axis=-1)
    ys = list(gray[..., 0])
    cs = [np.full((32, 32, 2), 128, np.uint8)] * 2
    label = np.zeros((2, 20), np.float32)
    label[0, 3] = label[1, 5] = 1.0
    rng = jax.random.key(1)
    cfg = MCLConfig()
    losses = []
    for batch in (
        {"img": img_u8, "label": label},
        {"img_y": np.stack(ys), "img_c": np.stack(cs), "label": label},
    ):
        state = create_train_state(jax.tree.map(jnp.array, variables), tx)
        state, metrics = mcl_train_step(model, tx, state, batch, rng, cfg)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-5)


def test_seg_dataset_pack_mask_parity(mini_voc, tmp_path):
    """pack_mask: the packed (mask, mask_idx) pair scattered back to dense
    must equal the dense pipeline EXACTLY (identical rng draw sequence and
    per-channel resize on a channel subset)."""
    root, names = mini_voc
    labels = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    mask_dir = tmp_path / "masks_pk"
    os.makedirs(mask_dir)
    rng = np.random.default_rng(0)
    for i, n in enumerate(names):
        img = Image.open(root / "JPEGImages" / f"{n}.jpg")
        w, h = img.size
        # walk-style pseudo-mask: only bg + this image's GT class nonzero
        m = np.zeros((h, w, 21), np.float16)
        m[..., 0] = rng.uniform(0, 0.5, (h, w))
        m[..., i + 1] = rng.uniform(0, 1, (h, w))
        np.save(mask_dir / f"{n}.npy", m)
    kw = dict(crop_size=48, device_norm=True)
    ds_d = VOC12SegDataset(names, str(root), labels, str(mask_dir), **kw)
    ds_p = VOC12SegDataset(
        names, str(root), labels, str(mask_dir), pack_mask=-1, **kw
    )
    assert ds_p.pack_mask == 2  # 1 label per mini_voc image + bg
    for idx in range(3):
        a = ds_d.get(idx, np.random.default_rng(9 + idx))
        b = ds_p.get(idx, np.random.default_rng(9 + idx))
        np.testing.assert_array_equal(a["img"], b["img"])
        assert b["mask"].shape == (48, 48, 2)
        np.testing.assert_array_equal(b["mask_idx"], [0, idx + 1])
        dense = np.zeros_like(a["mask"])
        for k, c in enumerate(b["mask_idx"]):
            dense[..., c] += b["mask"][..., k]
        np.testing.assert_array_equal(dense, a["mask"])

    # channel budget overflow must raise, not silently drop classes
    ds_1 = VOC12SegDataset(
        names, str(root), labels, str(mask_dir), pack_mask=1, **kw
    )
    with pytest.raises(ValueError, match="pack_mask=1"):
        ds_1.get(0, np.random.default_rng(0))


def test_seg_train_step_accepts_packed_mask():
    """The on-device scatter makes a packed batch's loss EQUAL the dense
    batch's (same uint8 quantisation, pad slots scatter zeros)."""
    import jax
    import jax.numpy as jnp

    from muscle_tpu.models import MuSCLe
    from muscle_tpu.training import SegConfig, create_train_state, seg_train_step
    from muscle_tpu.training.state import make_adam

    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True
    )
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)), mode="seg"
    )
    tx = make_adam(1e-5, 1e-5)
    rng_np = np.random.default_rng(0)
    img_u8 = rng_np.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    label = np.zeros((2, 20), np.float32)
    label[0, 3] = label[1, 5] = 1.0
    # dense mask nonzero only on bg + the GT class (+ one pad slot unused
    # in image 0: packed K=3 exercises zero-pad scatter)
    dense = np.zeros((2, 64, 64, 21), np.uint8)
    packed = np.zeros((2, 64, 64, 3), np.uint8)
    mask_idx = np.array([[0, 4, 0], [0, 6, 9]], np.int32)
    for n in range(2):
        for k, c in enumerate(mask_idx[n]):
            if k > 0 and c == 0:
                continue
            v = rng_np.integers(0, 256, (64, 64)).astype(np.uint8)
            dense[n, ..., c] = v
            packed[n, ..., k] = v
    rng = jax.random.key(1)
    cfg = SegConfig(k=16, step=3)
    losses = []
    for batch in (
        {"img": img_u8, "mask": dense, "label": label},
        {"img": img_u8, "mask": packed, "mask_idx": mask_idx, "label": label},
    ):
        state = create_train_state(jax.tree.map(jnp.array, variables), tx)
        state, metrics = seg_train_step(model, tx, state, batch, rng, cfg)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_bitpack_roundtrip():
    """core/bitpack.py: pack -> device unpack is the exact identity on 0/1
    masks (any leading shape, last dim % 8 == 0)."""
    from muscle_tpu.core.bitpack import packbits_last, unpackbits_last

    rng = np.random.default_rng(0)
    m = (rng.random((3, 7, 256)) < 0.3).astype(np.float32)
    p = packbits_last(m)
    assert p.shape == (3, 7, 32) and p.dtype == np.uint8
    rec = np.asarray(unpackbits_last(p, 256))
    np.testing.assert_array_equal(rec, m)

    with pytest.raises(ValueError):
        packbits_last(np.zeros((4, 12)))
    with pytest.raises(ValueError):
        unpackbits_last(p, 128)


def test_affinity_dataset_packed_upload(mini_voc):
    """pack_bits + upload='ycbcr420': bit-packed masks unpack to exactly
    the dense device_norm masks (same rng draws); the luma plane is PIL's
    exact Y of the identical uint8 canvas."""
    from PIL import Image as PILImage

    from muscle_tpu.core.bitpack import unpackbits_last

    root, names = mini_voc
    labels = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    kw = dict(crop_size=64, device_norm=True)
    ds_d = VOC12AffinityDataset(
        names, str(root), labels, str(root / "SegmentationClass"), **kw
    )
    ds_p = VOC12AffinityDataset(
        names, str(root), labels, str(root / "SegmentationClass"),
        upload="ycbcr420", pack_bits=True, **kw,
    )
    # cropped pair-grid width: (g - rf) * (g - 2*rf), g=16, rf=4 -> 96
    p_pairs = int(ds_d._pi.src_indices.size)
    assert p_pairs == 96
    for idx in range(2):
        a = ds_d.get(idx, np.random.default_rng(7 + idx))
        b = ds_p.get(idx, np.random.default_rng(7 + idx))
        assert set(b) == {"img_y", "img_c", "bg_pos", "fg_pos", "neg"}
        assert b["img_y"].shape == (64, 64) and b["img_c"].shape == (32, 32, 2)
        for k in ("bg_pos", "fg_pos", "neg"):
            assert b[k].dtype == np.uint8
            assert b[k].shape == (*a[k].shape[:-1], p_pairs // 8)
            rec = np.asarray(unpackbits_last(b[k], p_pairs))
            np.testing.assert_array_equal(rec, a[k].astype(np.float32))
        ref_y = np.asarray(
            PILImage.fromarray(a["img"], "RGB").convert("YCbCr").split()[0]
        )
        np.testing.assert_array_equal(b["img_y"], ref_y)

    # fast upload formats have no consumer without device_norm
    with pytest.raises(ValueError):
        VOC12AffinityDataset(
            names, str(root), labels, str(root / "SegmentationClass"),
            crop_size=64, pack_bits=True,
        )


def test_irn_train_step_accepts_packed(mini_voc):
    """irn_train_step: a bit-packed + neutral-chroma ycbcr batch must
    produce the same losses as the dense uint8 batch (both encodings are
    exact; see test_mcl_train_step_accepts_ycbcr for the chroma setup)."""
    import jax
    import jax.numpy as jnp

    from muscle_tpu.core.bitpack import packbits_last
    from muscle_tpu.models import IRNNet
    from muscle_tpu.training import create_train_state
    from muscle_tpu.training.irn import (
        IRNTrainConfig,
        _grid_path_index,
        irn_train_step,
    )
    from muscle_tpu.training.state import make_adam

    cfg = IRNTrainConfig(crop_size=64)
    pi = _grid_path_index(cfg)
    d, p = pi.dst_indices.shape

    model = IRNNet()
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3))
    )
    tx = make_adam(1e-3, 1e-4)
    rng_np = np.random.default_rng(1)
    gray = rng_np.integers(0, 256, (2, 64, 64, 1)).astype(np.uint8)
    img_u8 = np.repeat(gray, 3, axis=-1)
    bg = (rng_np.random((2, d, p)) < 0.2).astype(np.uint8)
    fg = ((rng_np.random((2, d, p)) < 0.2) & ~bg.astype(bool)).astype(np.uint8)
    ng = ((rng_np.random((2, d, p)) < 0.2) & ~(bg | fg).astype(bool)).astype(np.uint8)
    dense = {"img": img_u8, "bg_pos": bg, "fg_pos": fg, "neg": ng}
    packed = {
        "img_y": gray[..., 0],
        "img_c": np.full((2, 32, 32, 2), 128, np.uint8),
        "bg_pos": packbits_last(bg),
        "fg_pos": packbits_last(fg),
        "neg": packbits_last(ng),
    }
    all_metrics = []
    for batch in (dense, packed):
        state = create_train_state(jax.tree.map(jnp.array, variables), tx)
        state, metrics = irn_train_step(model, tx, state, batch, cfg)
        all_metrics.append({k: float(v) for k, v in metrics.items()})
    for k in all_metrics[0]:
        assert np.isfinite(all_metrics[0][k])
        np.testing.assert_allclose(
            all_metrics[0][k], all_metrics[1][k], rtol=2e-5, err_msg=k
        )


def test_seg_dataset_ycbcr_upload(mini_voc, tmp_path):
    """VOC12SegDataset upload='ycbcr420': same mask/label stream as the
    uint8 RGB pipeline (same rng draws), img replaced by exact-PIL luma +
    box-subsampled chroma planes."""
    from PIL import Image as PILImage

    root, names = mini_voc
    labels = np.load(root / "cls_labels.npy", allow_pickle=True).item()
    mask_dir = tmp_path / "masks_ycc"
    os.makedirs(mask_dir)
    rng = np.random.default_rng(0)
    for n in names:
        img = Image.open(root / "JPEGImages" / f"{n}.jpg")
        w, h = img.size
        np.save(mask_dir / f"{n}.npy", rng.uniform(0, 1, (h, w, 21)).astype(np.float16))
    kw = dict(crop_size=48, device_norm=True)
    ds_u = VOC12SegDataset(names, str(root), labels, str(mask_dir), **kw)
    ds_y = VOC12SegDataset(
        names, str(root), labels, str(mask_dir), upload="ycbcr420", **kw
    )
    for idx in range(2):
        a = ds_u.get(idx, np.random.default_rng(11 + idx))
        b = ds_y.get(idx, np.random.default_rng(11 + idx))
        assert set(b) == {"img_y", "img_c", "mask", "label"}
        assert b["img_y"].shape == (48, 48) and b["img_c"].shape == (24, 24, 2)
        np.testing.assert_array_equal(a["mask"], b["mask"])
        np.testing.assert_array_equal(a["label"], b["label"])
        ref_y = np.asarray(
            PILImage.fromarray(a["img"], "RGB").convert("YCbCr").split()[0]
        )
        np.testing.assert_array_equal(b["img_y"], ref_y)

    with pytest.raises(ValueError):
        VOC12SegDataset(
            names, str(root), labels, str(mask_dir), crop_size=48,
            upload="ycbcr420",
        )
