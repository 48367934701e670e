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
