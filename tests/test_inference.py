"""End-to-end inference engine tests on synthetic images (small b1 models,
random weights — exercises batching, canvas padding, resize-back, un-flip,
fusion, and artifact formats)."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from muscle_tpu.inference import CamTTAEngine, RandomWalkRefiner, SegTTAEngine
from muscle_tpu.models import EdgeDisplacement, MuSCLe


def _imgs(sizes, seed=0):
    rng = np.random.default_rng(seed)
    return [
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        for (h, w) in sizes
    ]


@pytest.fixture(scope="module")
def enc_model():
    model = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)), mode="cam"
    )
    return model, variables


def test_cam_engine_artifact_contract(enc_model):
    model, variables = enc_model
    engine = CamTTAEngine(
        model, variables, scales=(0.5, 1.0), out_side=64, max_side=60
    )
    sizes = [(50, 40), (40, 56)]
    labels = [np.zeros(20, np.float32) for _ in sizes]
    labels[0][[2, 7]] = 1
    labels[1][[0]] = 1
    out = engine.run_batch(_imgs(sizes), ["a", "b"], labels)

    assert [r["name"] for r in out] == ["a", "b"]
    assert sorted(out[0]["sgc"].keys()) == [2, 7]
    assert sorted(out[1]["sgc"].keys()) == [0]
    for r, (h, w) in zip(out, sizes):
        for m in r["sgc"].values():
            assert m.shape == (h, w) and m.dtype == np.float16
            assert np.isfinite(m.astype(np.float32)).all()
            assert m.max() <= 1.0 + 1e-2
        assert r["score"].shape == (20,)
        assert (r["score"] >= 0).all() and (r["score"] <= 1).all()


def test_cam_engine_flip_consistency(enc_model):
    """A mirrored input image must produce (numerically) mirrored fused maps
    — the TTA already averages orig+flip, so fusing a flipped image should
    give the mirror of fusing the original."""
    model, variables = enc_model
    engine = CamTTAEngine(model, variables, scales=(1.0,), out_side=64, max_side=60)
    img = _imgs([(48, 40)])[0]
    lab = np.zeros(20, np.float32)
    lab[3] = 1
    out1 = engine.run_batch([img], ["x"], [lab])[0]["sgc"][3].astype(np.float32)
    flipped = Image.fromarray(np.asarray(img)[:, ::-1])
    out2 = engine.run_batch([flipped], ["x"], [lab])[0]["sgc"][3].astype(np.float32)
    np.testing.assert_allclose(out1, out2[:, ::-1], atol=2e-2)


def test_seg_engine_probs(enc_model):
    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True
    )
    variables = model.init(
        {"params": jax.random.key(1)}, jnp.zeros((1, 32, 32, 3)), mode="seg"
    )
    engine = SegTTAEngine(model, variables, scales=(0.5, 1.0), out_side=64, max_side=60)
    sizes = [(50, 40), (40, 56)]
    out = engine.run_batch(_imgs(sizes), ["a", "b"])
    for r, (h, w) in zip(out, sizes):
        assert r["probs"].shape == (h, w, 21)
        np.testing.assert_allclose(r["probs"].sum(-1), 1.0, atol=1e-3)

    # class gating zeroes gated-out classes
    gate = np.zeros(21, np.float32)
    gate[0] = gate[5] = 1
    gated = engine.run_batch(_imgs(sizes[:1]), ["a"], [gate])[0]["probs"]
    assert np.abs(gated[..., 1:5]).max() == 0


def test_seg_device_tta_matches_host(enc_model):
    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True
    )
    variables = model.init(
        {"params": jax.random.key(7)}, jnp.zeros((1, 32, 32, 3)), mode="seg"
    )
    imgs = _imgs([(50, 40)], seed=11)
    # upload_mode='rgb': the host path uploads float canvases, so the
    # device arm must not take the (default) lossy ycbcr420 encoding
    kw = dict(scales=(0.5, 1.0), out_side=64, max_side=50, upload_mode="rgb")
    host = SegTTAEngine(model, variables, device_tta=False, **kw).run_batch(imgs, ["a"])[0]
    dev = SegTTAEngine(model, variables, device_tta=True, **kw).run_batch(imgs, ["a"])[0]
    np.testing.assert_allclose(dev["probs"], host["probs"], atol=5e-3)


def test_seg_lowres_matches_fullres(enc_model):
    """stride-4 logits + engine upsample must equal the reference-shaped
    full-res path (1x1 conv commutes with bilinear resize)."""
    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True
    )
    variables = model.init(
        {"params": jax.random.key(3)}, jnp.zeros((1, 32, 32, 3)), mode="seg"
    )
    sizes = [(48, 40)]
    imgs = _imgs(sizes, seed=5)
    full = SegTTAEngine(
        model, variables, scales=(1.0,), out_side=64, max_side=60, lowres=False
    ).run_batch(imgs, ["a"])[0]["probs"]
    low = SegTTAEngine(
        model, variables, scales=(1.0,), out_side=64, max_side=60, lowres=True
    ).run_batch(imgs, ["a"])[0]["probs"]
    np.testing.assert_allclose(low, full, atol=2e-5)


def test_seg_fast_mode_close_to_parity_mode():
    """accum_stride=4 + f16 download + tight upload (the production seg
    fast mode — cuts the 176MB/batch f32 probs download 128-fold) must
    stay close to the stride-1 f32 path."""
    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True
    )
    variables = model.init(
        {"params": jax.random.key(7)}, jnp.zeros((1, 32, 32, 3)), mode="seg"
    )
    imgs = _imgs([(50, 40), (40, 56)], seed=13)
    kw = dict(scales=(0.5, 1.0), out_side=64, max_side=56, device_tta=True)
    base = SegTTAEngine(model, variables, **kw).run_batch(imgs, ["a", "b"])
    fast = SegTTAEngine(
        model, variables, accum_stride=4, download_dtype="float16",
        tight_upload=True, **kw
    ).run_batch(imgs, ["a", "b"])
    for x, y in zip(base, fast):
        assert x["probs"].shape == y["probs"].shape
        assert np.abs(x["probs"] - y["probs"]).mean() < 0.01


def test_cam_lowres_close_to_fullres(enc_model):
    """lowres applies the reference two-stage resample chain as ONE
    composed weight matrix (core/resize.py) — must match the
    stage-by-stage lowres=False path to float tolerance (the min-max
    fusion amplifies float noise on random-weight maps, hence the
    modest absolute bound on the NORMALISED maps)."""
    model, variables = enc_model
    lab = np.zeros(20, np.float32)
    lab[4] = 1
    # canvas == image: no padding, so lowres=False (stage-by-stage) and
    # the composed chain must agree to float tolerance
    imgs = _imgs([(64, 64)], seed=6)
    kw = dict(scales=(1.0,), out_side=64, max_side=64)
    full = CamTTAEngine(
        model, variables, lowres=False, **kw
    ).run_batch(imgs, ["a"], [lab])[0]["sgc"][4].astype(np.float32)
    low = CamTTAEngine(
        model, variables, lowres=True, **kw
    ).run_batch(imgs, ["a"], [lab])[0]["sgc"][4].astype(np.float32)
    assert np.abs(low - full).mean() < 2e-3, np.abs(low - full).mean()

    # padded case: the two paths differ by design (lowres=False resizes
    # the canvas-wide map; the composed chain applies the reference's
    # window semantics — the more faithful of the two, see
    # tools/fast_attribution.py) — structural agreement only.  Compare
    # mean-removed maps: min-max normalisation of a DEGENERATE random-
    # weight CAM (constant map) leaves an arbitrary constant whose offset
    # between the paths is noise, not structure (observed 0.063 after the
    # static-pad floor-chain change).
    imgs = _imgs([(48, 40)], seed=6)
    kw = dict(scales=(1.0,), out_side=64, max_side=60)
    full = CamTTAEngine(
        model, variables, lowres=False, **kw
    ).run_batch(imgs, ["a"], [lab])[0]["sgc"][4].astype(np.float32)
    low = CamTTAEngine(
        model, variables, lowres=True, **kw
    ).run_batch(imgs, ["a"], [lab])[0]["sgc"][4].astype(np.float32)
    assert np.abs((low - low.mean()) - (full - full.mean())).mean() < 0.05
    if full.std() > 1e-3 and low.std() > 1e-3:
        corr = np.corrcoef(low.reshape(-1), full.reshape(-1))[0, 1]
        assert corr > 0.95


def test_cam_device_tta_matches_host_path(enc_model):
    """The device-resident TTA (uint8 upload + on-device PIL-compatible
    cubic resize + selective download) must reproduce the host-prep path."""
    model, variables = enc_model
    rng = np.random.default_rng(9)
    imgs = _imgs([(50, 40)], seed=9)
    lab = np.zeros(20, np.float32)
    lab[3] = 1
    kw = dict(scales=(0.5, 1.0), out_side=64, max_side=50)
    host = CamTTAEngine(model, variables, device_tta=False, **kw).run_batch(
        imgs, ["a"], [lab]
    )[0]
    dev = CamTTAEngine(model, variables, device_tta=True, **kw).run_batch(
        imgs, ["a"], [lab]
    )[0]
    np.testing.assert_allclose(
        dev["sgc"][3].astype(np.float32), host["sgc"][3].astype(np.float32), atol=5e-3
    )
    np.testing.assert_allclose(dev["score"], host["score"], atol=1e-4)


class _StubCamModel:
    """Drop-in for MuSCLe in engine tests: produces SMOOTH, STRUCTURED
    stride-16 maps (channel = fixed linear mixes of a pooled image) so the
    min-max fusion is non-degenerate — random-weight b1 maps are
    near-constant (spread ~1e-7), which makes the reference's pre-norm
    zeroing collapse every normalised map and says nothing about resample
    fidelity."""

    def apply(self, variables, x, mode="cam_lowres", valid_hw=None,
              valid_window=None, **kw):
        b, h, w, _ = x.shape
        g = 16
        pooled = x.reshape(b, h // g, g, w // g, g, 3).mean(axis=(2, 4))
        mix = jnp.asarray(variables["mix"])  # (3, 21)
        maps = jnp.einsum("bhwc,ck->bhwk", pooled, mix)
        sgc = jnp.einsum("bhwc,ck->bhwk", pooled ** 2, mix)
        if valid_window is not None:
            # engines pass (oy, ox, h, w) placement windows; the stub has no
            # real window semantics, so mask the GAP to the cells the placed
            # image touches (canvas-size independent, like MuSCLe's masked
            # reductions)
            valid_hw = valid_window[:, :2] + valid_window[:, 2:]
        if valid_hw is not None:
            # masked GAP over the valid feature window, like MuSCLe
            eff = (valid_hw + g - 1) // g
            rows = jnp.arange(h // g)[None, :, None]
            cols = jnp.arange(w // g)[None, None, :]
            m = ((rows < eff[:, 0:1, None]) & (cols < eff[:, 1:2, None]))[..., None]
            emb = (maps * m).sum(axis=(1, 2)) / m.sum(axis=(1, 2))
        else:
            emb = maps.mean(axis=(1, 2))
        return maps, sgc, emb, emb


def test_cam_device_tta_lowacc_uint8_close_to_full():
    """accum_stride=4 + uint8 download (the production fast mode: maps
    accumulated on an out_side/4 grid, min-max normalised there, quantised,
    host-upsampled) must stay close to the stride-1 f16 path.  Bounds the
    DEVIATIONS.md resample-chain delta on structured synthetic maps."""
    rng = np.random.default_rng(11)
    model = _StubCamModel()
    # positive mixes: all-negative channels make every fg value clip to 0
    # and the min-max fusion degenerate (constant-map case)
    variables = {"mix": (0.1 + np.abs(rng.normal(size=(3, 21)))).astype(np.float32)}
    imgs = _imgs([(200, 160), (160, 224)], seed=11)
    labels = [np.zeros(20, np.float32) for _ in imgs]
    labels[0][3] = 1
    labels[1][[5, 7]] = 1
    kw = dict(scales=(0.5, 1.0), out_side=256, max_side=224, device_tta=True)
    full = CamTTAEngine(model, variables, **kw).run_batch(imgs, ["a", "b"], labels)
    fast = CamTTAEngine(
        model, variables, accum_stride=4, download_dtype="uint8", **kw
    ).run_batch(imgs, ["a", "b"], labels)
    for f, q, lab in zip(full, fast, labels):
        np.testing.assert_allclose(f["score"], q["score"], atol=1e-4)
        for c in np.nonzero(lab)[0]:
            a = f["sgc"][c].astype(np.float32)
            b = q["sgc"][c].astype(np.float32)
            assert a.shape == b.shape
            assert np.abs(a - b).mean() < 0.03, (c, np.abs(a - b).mean())


def test_cam_device_tta_tight_upload_bitwise(enc_model):
    """tight_upload (transposed short-side canvas) must be bitwise identical
    to the square-canvas device path — the un-transpose is exact."""
    model, variables = enc_model
    imgs = _imgs([(50, 40), (40, 56)], seed=12)  # one landscape, one portrait
    labels = [np.zeros(20, np.float32) for _ in imgs]
    labels[0][3] = 1
    labels[1][5] = 1
    kw = dict(scales=(0.5, 1.0), out_side=64, max_side=56, device_tta=True)
    base = CamTTAEngine(model, variables, **kw).run_batch(imgs, ["a", "b"], labels)
    tight = CamTTAEngine(model, variables, tight_upload=True, **kw).run_batch(
        imgs, ["a", "b"], labels
    )
    for x, y, lab in zip(base, tight, labels):
        np.testing.assert_array_equal(x["score"], y["score"])
        for c in np.nonzero(lab)[0]:
            np.testing.assert_array_equal(x["sgc"][c], y["sgc"][c])


def test_cam_device_tta_rect_canvas_matches_square(monkeypatch):
    """Orientation-homogeneous batches get a rectangular per-scale canvas
    (batch-max scaled h x w, inference/cam.py _batch_canvas) — must match
    the square-canvas device path to float tolerance, since the dropped
    region is zero padding outside every image's window."""
    import muscle_tpu.inference.cam as cam_mod
    from muscle_tpu.data.tta import bucket_side
    from muscle_tpu.inference.cam import _batch_canvas

    sizes = [(100, 160), (90, 150)]  # landscape-only
    # the rectangular bucket actually differs from the square one here
    assert _batch_canvas(1.0, np.array(sizes), 160) == (128, 192)
    rng = np.random.default_rng(15)
    model = _StubCamModel()
    variables = {"mix": (0.1 + np.abs(rng.normal(size=(3, 21)))).astype(np.float32)}
    imgs = _imgs(sizes, seed=15)
    labels = [np.zeros(20, np.float32) for _ in sizes]
    labels[0][2] = 1
    labels[1][6] = 1
    kw = dict(scales=(0.5, 1.0), out_side=192, max_side=160, device_tta=True)
    rect = CamTTAEngine(model, variables, **kw).run_batch(imgs, ["a", "b"], labels)
    monkeypatch.setattr(
        cam_mod, "_batch_canvas",
        lambda s, o, m: (bucket_side(s, m), bucket_side(s, m)),
    )
    square = CamTTAEngine(model, variables, **kw).run_batch(imgs, ["a", "b"], labels)
    for x, y, lab in zip(square, rect, labels):
        np.testing.assert_allclose(x["score"], y["score"], atol=1e-5)
        for c in np.nonzero(lab)[0]:
            np.testing.assert_allclose(
                x["sgc"][c].astype(np.float32), y["sgc"][c].astype(np.float32),
                atol=1e-4,
            )


def test_seg_device_tta_rect_canvas_matches_host():
    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True
    )
    variables = model.init(
        {"params": jax.random.key(7)}, jnp.zeros((1, 32, 32, 3)), mode="seg"
    )
    imgs = _imgs([(100, 160), (90, 150)], seed=16)
    kw = dict(scales=(0.5, 1.0), out_side=192, max_side=160, upload_mode="rgb")
    host = SegTTAEngine(model, variables, device_tta=False, **kw).run_batch(
        imgs, ["a", "b"]
    )
    dev = SegTTAEngine(model, variables, device_tta=True, **kw).run_batch(
        imgs, ["a", "b"]
    )
    for x, y in zip(host, dev):
        np.testing.assert_allclose(x["probs"], y["probs"], atol=5e-3)


def test_pack_canvas_ycbcr_roundtrip():
    """Host 4:2:0 pack -> device unpack must reconstruct smooth images
    closely (chroma is half-res; Y is exact up to the BT.601 roundtrip).
    Covers both orientations (one image stored transposed)."""
    from muscle_tpu.data.tta import pack_canvas_ycbcr
    from muscle_tpu.inference.upload import ycbcr420_unpack_fn

    rng = np.random.default_rng(3)
    imgs = []
    # (60, 90) landscape fits the 64-bucketed short-side canvas; (100, 60)
    # portrait exceeds it and is stored transposed
    for h, w in [(60, 90), (100, 60)]:
        yy = np.linspace(0, 1, h)[:, None, None]
        xx = np.linspace(0, 1, w)[None, :, None]
        base = 255 * (0.25 + 0.5 * (yy * [1, 0.3, 0.7] + xx * [0.2, 0.8, 0.1]) / 1.1)
        base += rng.normal(0, 3, size=(h, w, 3))
        imgs.append(Image.fromarray(np.clip(base, 0, 255).astype(np.uint8)))
    y, c, sizes, transposed = pack_canvas_ycbcr(imgs, ["a", "b"], 128, tight=True)
    assert transposed.tolist() == [False, True]
    assert y.shape == (2, 64, 128) and c.shape == (2, 32, 64, 2)
    rgb = np.asarray(
        ycbcr420_unpack_fn(128)(jnp.asarray(y), jnp.asarray(c), jnp.asarray(transposed))
    )
    for i, img in enumerate(imgs):
        h, w = sizes[i]
        err = np.abs(rgb[i, :h, :w] - np.asarray(img, np.float32))
        assert err.mean() < 2.0, err.mean()  # 0-255 units
        assert err.max() < 16.0, err.max()


def test_cam_upload_ycbcr_close_to_rgb():
    """ycbcr420 upload (production link saver) must stay close to the RGB
    upload on the same engine config — bounds the chroma-subsample + BT.601
    roundtrip deviation on structured maps (DEVIATIONS.md)."""
    rng = np.random.default_rng(13)
    model = _StubCamModel()
    variables = {"mix": (0.1 + np.abs(rng.normal(size=(3, 21)))).astype(np.float32)}
    imgs = _imgs([(200, 160), (160, 224)], seed=13)
    labels = [np.zeros(20, np.float32) for _ in imgs]
    labels[0][3] = 1
    labels[1][[5, 7]] = 1
    kw = dict(scales=(0.5, 1.0), out_side=256, max_side=224, device_tta=True,
              tight_upload=True)
    base = CamTTAEngine(model, variables, **kw).run_batch(imgs, ["a", "b"], labels)
    ycc = CamTTAEngine(model, variables, upload_mode="ycbcr420", **kw).run_batch(
        imgs, ["a", "b"], labels
    )
    for f, q, lab in zip(base, ycc, labels):
        # the stub's logits are raw pixel means over the valid window —
        # maximally chroma-sensitive, unlike a trained classifier head
        # (gate 1 bounds real score deltas at 1e-3); 0.02 on the sigmoid
        # scale for uint8-noise inputs
        np.testing.assert_allclose(f["score"], q["score"], atol=2e-2)
        for cidx in np.nonzero(lab)[0]:
            a = f["sgc"][cidx].astype(np.float32)
            b = q["sgc"][cidx].astype(np.float32)
            assert np.abs(a - b).mean() < 0.02, (cidx, np.abs(a - b).mean())


def test_seg_upload_ycbcr_close_to_rgb():
    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True
    )
    variables = model.init(
        {"params": jax.random.key(7)}, jnp.zeros((1, 32, 32, 3)), mode="seg"
    )
    imgs = _imgs([(50, 40), (40, 56)], seed=14)
    kw = dict(scales=(0.5, 1.0), out_side=64, max_side=56, device_tta=True)
    base = SegTTAEngine(model, variables, upload_mode="rgb", **kw).run_batch(
        imgs, ["a", "b"]
    )
    ycc = SegTTAEngine(model, variables, upload_mode="ycbcr420", **kw).run_batch(
        imgs, ["a", "b"]
    )
    for x, y in zip(base, ycc):
        assert np.abs(x["probs"] - y["probs"]).mean() < 0.01


class _StubSegModel:
    """Seg-mode stub (see _StubCamModel): smooth structured stride-8
    logits with a strong class separation, so the argmax regions are
    large and boundary near-ties don't dominate the comparison the way
    they do on a random-init b1 (near-uniform softmax)."""

    def apply(self, variables, x, mode="seg_lowres", valid_window=None, **kw):
        b, h, w, _ = x.shape
        g = 8 if mode == "seg_lowres" else 1
        pooled = x.reshape(b, h // g, g, w // g, g, 3).mean(axis=(2, 4))
        mix = jnp.asarray(variables["mix"])  # (3, 21)
        return 8.0 * jnp.einsum("bhwc,ck->bhwk", pooled, mix), None


def _smooth_imgs(sizes, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for h, w in sizes:
        yy = np.linspace(0, 1, h)[:, None, None]
        xx = np.linspace(0, 1, w)[None, :, None]
        base = 255 * (0.2 + 0.6 * (yy * [1, 0.3, 0.7] + xx * [0.2, 0.8, 0.1]) / 1.1)
        base += rng.normal(0, 2, size=(h, w, 3))
        out.append(Image.fromarray(np.clip(base, 0, 255).astype(np.uint8)))
    return out


@pytest.mark.parametrize("stride", [1, 4])
def test_seg_labels_mode_matches_probs_argmax(stride):
    """output='labels' (device window-upsample + fused argmax, uint8
    download) must agree with the probs path's host argmax — stride 1 is
    an identity resize on both arms (agreement ~1); stride 4 bounds the
    device-f32-resize vs host-PIL-resize boundary rounding."""
    rng = np.random.default_rng(5)
    model = _StubSegModel()
    variables = {"mix": rng.normal(size=(3, 21)).astype(np.float32)}
    sizes = [(50, 40), (40, 56)]
    imgs = _smooth_imgs(sizes, seed=21)
    kw = dict(scales=(0.5, 1.0), out_side=64, max_side=56, device_tta=True,
              accum_stride=stride)
    probs = SegTTAEngine(model, variables, **kw).run_batch(imgs, ["a", "b"])
    labels = SegTTAEngine(model, variables, output="labels", **kw).run_batch(
        imgs, ["a", "b"]
    )
    for p, l, (h, w) in zip(probs, labels, sizes):
        assert l["label"].shape == (h, w) and l["label"].dtype == np.uint8
        ref = np.argmax(p["probs"], axis=-1)
        agree = float((ref == l["label"]).mean())
        assert agree >= (0.999 if stride == 1 else 0.97), agree


def test_seg_labels_mode_rejects_probs_only_options():
    model = _StubSegModel()
    variables = {"mix": np.eye(3, 21, dtype=np.float32)}
    with pytest.raises(ValueError, match="labels"):
        SegTTAEngine(model, variables, device_tta=False, output="labels")
    engine = SegTTAEngine(model, variables, scales=(1.0,), out_side=64,
                          max_side=56, output="labels")
    gate = np.ones(21, np.float32)
    with pytest.raises(ValueError, match="cls_gates"):
        engine.run_batch(_smooth_imgs([(40, 40)]), ["a"], [gate])


def test_random_walk_refiner(tmp_path):
    model = EdgeDisplacement(crop_size=64)
    variables = model.init(
        {"params": jax.random.key(2)}, jnp.zeros((2, 64, 64, 3))
    )
    refiner = RandomWalkRefiner(model, variables, crop_size=64)
    img = _imgs([(50, 44)])[0]
    cam_dict = {
        3: np.random.default_rng(0).uniform(0, 1, (50, 44)).astype(np.float16)
    }
    scores = refiner.refine_image(img, cam_dict)
    assert scores.shape == (50, 44, 21)
    # bg channel is the constant threshold
    np.testing.assert_allclose(scores[..., 0], 0.35, atol=1e-6)
    # only the labelled class carries fg mass
    assert scores[..., 1 + 3].max() > 0
    others = np.delete(scores[..., 1:], 3, axis=-1)
    assert np.abs(others).max() == 0
    labels = refiner.to_png_labels(scores)
    assert set(np.unique(labels)) <= {0, 4}

    # batched refinement matches per-image refinement
    img2 = _imgs([(44, 50)], seed=4)[0]
    cam2 = {5: np.random.default_rng(1).uniform(0, 1, (44, 50)).astype(np.float16)}
    batched = refiner.refine_batch([img, img2], [cam_dict, cam2])
    np.testing.assert_allclose(batched[0], scores, atol=5e-5)
    single2 = refiner.refine_image(img2, cam2)
    np.testing.assert_allclose(batched[1], single2, atol=5e-5)

    # fast_io (ycbcr upload, K-channel f16 CAMs, grid-res f16 download +
    # host upsample) must stay close to the parity path — bounds the
    # DEVIATIONS.md fast-IO delta on this synthetic config
    fast = RandomWalkRefiner(model, variables, crop_size=64, fast_io=True)
    fast_out = fast.refine_batch([img, img2], [cam_dict, cam2])
    for a, b in zip(fast_out, batched):
        assert a.shape == b.shape
        np.testing.assert_allclose(a[..., 0], 0.35, atol=1e-3)
        assert np.abs(a - b).mean() < 0.02, np.abs(a - b).mean()

    # bf16 edge-model compute (walk stays f32): bounded deviation vs f32
    b16 = RandomWalkRefiner(
        model, variables, crop_size=64, compute_dtype=jnp.bfloat16
    )
    out16 = b16.refine_image(img, cam_dict)
    assert np.abs(out16 - scores).mean() < 0.02, np.abs(out16 - scores).mean()


def test_irn_labels_mode():
    """output='labels' (device-fused reference tail: window-clamped 4x
    upsample, window /max, bg threshold, argmax — DEVIATIONS.md #16) must
    agree with the fast scores path + host argmax away from class
    boundaries, and reject non-fast_io construction."""
    model = EdgeDisplacement(crop_size=64)
    variables = model.init(
        {"params": jax.random.key(2)}, jnp.zeros((2, 64, 64, 3))
    )
    with pytest.raises(ValueError, match="fast_io"):
        RandomWalkRefiner(model, variables, crop_size=64, output="labels")
    imgs = _imgs([(50, 44), (44, 50)], seed=4)
    rng = np.random.default_rng(0)
    dicts = [
        {3: rng.uniform(0, 1, (50, 44)).astype(np.float16)},
        {5: rng.uniform(0, 1, (44, 50)).astype(np.float16),
         7: rng.uniform(0, 1, (44, 50)).astype(np.float16)},
    ]
    fast = RandomWalkRefiner(model, variables, crop_size=64, fast_io=True)
    lab = RandomWalkRefiner(model, variables, crop_size=64, fast_io=True,
                            output="labels")
    scores = fast.refine_batch(imgs, dicts)
    labels = lab.refine_batch(imgs, dicts)
    for s, l, img in zip(scores, labels, imgs):
        w, h = img.size
        assert l.shape == (h, w) and l.dtype == np.uint8
        ref = fast.to_png_labels(s)
        agree = float((ref == l).mean())
        assert agree >= 0.97, agree
        assert lab.to_png_labels(l) is l


def test_cam_run_stream_matches_run_batch(enc_model):
    """The threaded prep->dispatch->finalize stream must be bitwise
    identical to the per-batch device path, per batch and in order."""
    model, variables = enc_model
    engine = CamTTAEngine(
        model, variables, scales=(0.5, 1.0), out_side=64, max_side=60,
        device_tta=True, max_classes=4, return_cam=False, accum_stride=4,
        download_dtype="uint8", tight_upload=True, upload_mode="ycbcr420",
    )

    def batch(i):
        sizes = [(50, 40), (40, 56)]
        labels = [np.zeros(20, np.float32) for _ in sizes]
        labels[0][[i % 20, (i + 3) % 20]] = 1
        labels[1][[(i + 1) % 20]] = 1
        return _imgs(sizes, seed=i), [f"s{i}_0", f"s{i}_1"], labels

    want = [engine.run_batch(*batch(i)) for i in range(3)]
    got = list(engine.run_stream(batch(i) for i in range(3)))
    assert len(got) == 3
    for wb, gb in zip(want, got):
        for w, g in zip(wb, gb):
            assert w["name"] == g["name"]
            np.testing.assert_array_equal(w["score"], g["score"])
            assert sorted(w["sgc"]) == sorted(g["sgc"])
            for k in w["sgc"]:
                np.testing.assert_array_equal(w["sgc"][k], g["sgc"][k])


def test_cam_run_stream_propagates_producer_error(enc_model):
    model, variables = enc_model
    engine = CamTTAEngine(
        model, variables, scales=(0.5,), out_side=64, max_side=60,
        device_tta=True, max_classes=2, return_cam=False, accum_stride=4,
        download_dtype="uint8", tight_upload=True, upload_mode="ycbcr420",
    )

    def batches():
        yield _imgs([(40, 40)]), ["ok"], [np.ones(20, np.float32)]
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(engine.run_stream(batches()))


def test_seg_run_stream_matches_run_batch(enc_model):
    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1,
        last_pooling=True,
    )
    variables = model.init(
        {"params": jax.random.key(1)}, jnp.zeros((1, 32, 32, 3)), mode="seg"
    )
    engine = SegTTAEngine(
        model, variables, scales=(0.5, 1.0), out_side=64, max_side=60,
        accum_stride=4, download_dtype="float16", tight_upload=True,
        upload_mode="ycbcr420",
    )

    def batch(i):
        return _imgs([(50, 40), (40, 56)], seed=10 + i), [f"g{i}_0", f"g{i}_1"]

    want = [engine.run_batch(*batch(i)) for i in range(2)]
    got = list(engine.run_stream(batch(i) for i in range(2)))
    for wb, gb in zip(want, got):
        for w, g in zip(wb, gb):
            assert w["name"] == g["name"]
            np.testing.assert_array_equal(w["probs"], g["probs"])


def test_seg_window_exact_canvas_equals_unpadded():
    """Window-exact dec forward (DEVIATIONS.md #8, seg half): an image
    embedded at its TF-SAME placement offset in a larger canvas, run with
    valid_window through the backbone AND the BiFPN window mode, must equal
    the same model's unpadded forward — for both 'seg' and 'seg_lowres'."""
    import jax
    import numpy as np

    from muscle_tpu.models import MuSCLe
    from muscle_tpu.models.efficientnet import placement_offset

    rng = np.random.default_rng(7)
    h, w = 48, 56
    model = MuSCLe(backbone_name="efficientnet-b1", mode="dec",
                   bifpn_layers=1, last_pooling=True)
    x = rng.normal(size=(1, h, w, 3)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 64, 64, 3)), mode="seg")

    want_seg, _ = model.apply(variables, jnp.asarray(x), mode="seg")
    want_low, want_p3 = model.apply(variables, jnp.asarray(x), mode="seg_lowres")

    off = placement_offset(np.array([[h, w]], np.int32), 5)[0]
    canvas = np.zeros((1, 128, 128, 3), np.float32)
    canvas[0, off[0]:off[0] + h, off[1]:off[1] + w] = x[0]
    win = jnp.asarray([[off[0], off[1], h, w]], jnp.int32)

    got_seg, _ = model.apply(variables, jnp.asarray(canvas), mode="seg",
                             valid_window=win)
    # 'seg' window mode writes the window-size result at the canvas origin
    np.testing.assert_allclose(
        np.asarray(got_seg)[0, :h, :w], np.asarray(want_seg)[0],
        atol=2e-5, rtol=1e-4,
    )

    got_low, got_p3 = model.apply(variables, jnp.asarray(canvas),
                                  mode="seg_lowres", valid_window=win)
    # stride-8 logits live at the advanced window inside the p3 canvas
    from muscle_tpu.models.efficientnet import advance_window

    w8 = np.asarray(advance_window(advance_window(advance_window(
        np.array([[off[0], off[1], h, w]], np.int32)))))[0]
    oy, ox, hh, ww = w8
    np.testing.assert_allclose(
        np.asarray(got_low)[0, oy:oy + hh, ox:ox + ww],
        np.asarray(want_low)[0],
        atol=2e-5, rtol=1e-4,
    )
