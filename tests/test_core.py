"""Unit tests for the core numeric substrate, with parity checks against
torch (CPU) where the reference semantics come from torch ops."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from muscle_tpu.core import (
    attach_bg_channel,
    cam_maxnorm,
    cam_maxnorm_with_bg,
    cam_softmaxnorm,
    orient_quantize,
    resize_bilinear,
    sobel_edges,
    voc_color_map,
)


def _torch_cam_maxnorm(cams):
    # reference train_mcl.py:21-28
    cams = torch.relu(cams)
    n, c, h, w = cams.shape
    cam_min = torch.min(cams.view(n, c, -1), dim=-1)[0].view(n, c, 1, 1)
    cam_max = torch.max(cams.view(n, c, -1), dim=-1)[0].view(n, c, 1, 1)
    norm = (cams - cam_min - 1e-6) / (cam_max - cam_min + 1e-6)
    return torch.relu(norm)


def _torch_cam_softmaxnorm(cams):
    # reference train_mcl.py:30-36
    fg = torch.softmax(cams[:, 1:], dim=1)
    bg = (1 - torch.max(fg, dim=1)[0]).unsqueeze(1)
    return torch.cat([bg, fg], dim=1)


def test_cam_maxnorm_matches_reference_semantics(rng):
    x = rng.normal(size=(2, 21, 9, 11)).astype(np.float32)
    want = _torch_cam_maxnorm(torch.from_numpy(x)).numpy()
    got = np.asarray(cam_maxnorm(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-6)


def test_cam_softmaxnorm_matches_reference_semantics(rng):
    x = rng.normal(size=(3, 21, 5, 7)).astype(np.float32)
    want = _torch_cam_softmaxnorm(torch.from_numpy(x)).numpy()
    got = np.asarray(cam_softmaxnorm(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-6)


def test_cam_maxnorm_with_bg_bg_channel(rng):
    x = rng.normal(size=(1, 4, 6, 6)).astype(np.float32)
    got = np.asarray(cam_maxnorm_with_bg(jnp.asarray(x.transpose(0, 2, 3, 1))))
    fg = got[..., 1:]
    np.testing.assert_allclose(
        got[..., 0], np.maximum(1.0 - fg.max(-1), 0.0), atol=1e-6
    )


def test_attach_bg_channel():
    lab = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(attach_bg_channel(lab))
    np.testing.assert_array_equal(out, [[1.0, 0.0, 1.0, 0.0]])


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw", [((7, 9), (13, 5)), ((14, 14), (56, 56)), ((5, 5), (5, 5)), ((1, 8), (4, 3))]
)
def test_resize_bilinear_matches_torch(rng, align_corners, in_hw, out_hw):
    x = rng.normal(size=(2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align_corners
    ).numpy()
    got = np.asarray(
        resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw, align_corners)
    )
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


@pytest.mark.parametrize("ksize", [3, 5])
def test_sobel_edges_matches_torch_conv(rng, ksize):
    from muscle_tpu.core.sobel import sobel_kernel

    x = rng.normal(size=(2, 1, 12, 12)).astype(np.float32)
    k = sobel_kernel(ksize)  # kh,kw,2
    kt = torch.from_numpy(k.transpose(2, 0, 1)[:, None])  # 2,1,kh,kw
    want = F.conv2d(torch.from_numpy(x), kt, padding=ksize // 2).numpy()
    got = np.asarray(sobel_edges(jnp.asarray(x.transpose(0, 2, 3, 1)), ksize, orient=True))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)
    # magnitude variant
    want_mag = np.sqrt((want**2).sum(1, keepdims=True) + 1e-8)
    got_mag = np.asarray(sobel_edges(jnp.asarray(x.transpose(0, 2, 3, 1)), ksize, orient=False))
    np.testing.assert_allclose(got_mag.transpose(0, 3, 1, 2), want_mag, atol=1e-5)


def test_orient_quantize_partition(rng):
    g = rng.normal(size=(64, 2)).astype(np.float32)
    mag, bins = orient_quantize(jnp.asarray(g))
    mag, bins = np.asarray(mag), np.asarray(bins)
    np.testing.assert_allclose(mag, np.sqrt((g**2).sum(-1) + 1e-8), rtol=1e-5)
    theta = np.arctan2(g[:, 1], g[:, 0])
    div = 3.1416 / 8
    # reproduce the reference's eight masks (src/edge.py:72-88)
    want = np.full(theta.shape, -1)
    masks = [
        (3 * div > theta) & (theta >= div),
        (5 * div > theta) & (theta >= 3 * div),
        (7 * div > theta) & (theta >= 5 * div),
        ((8 * div > theta) & (theta >= 7 * div)) | ((-7 * div > theta) & (theta >= -8 * div)),
        (-5 * div > theta) & (theta >= -7 * div),
        (-3 * div > theta) & (theta >= -5 * div),
        (-1 * div > theta) & (theta >= -3 * div),
        (div > theta) & (theta >= -1 * div),
    ]
    for v, m in enumerate(masks):
        want[m] = v
    covered = want >= 0
    np.testing.assert_array_equal(bins[covered], want[covered])


def test_voc_color_map_known_entries():
    cmap = voc_color_map()
    np.testing.assert_array_equal(cmap[0], [0, 0, 0])
    np.testing.assert_array_equal(cmap[1], [128, 0, 0])
    np.testing.assert_array_equal(cmap[15], [192, 128, 128])  # person
    np.testing.assert_array_equal(cmap[255], [224, 224, 192])


def test_window_avgpool_matches_torch(rng):
    """batched_window_avgpool_s2 == F.avg_pool2d(3, 2, padding=1,
    count_include_pad=True) applied to the unpadded window (the BiFPN
    downsample, reference src/MuSCLe.py:51,54), written at the canvas
    origin."""
    import torch
    import torch.nn.functional as F

    from muscle_tpu.core.resize import batched_window_avgpool_s2

    for (h, w, oy, ox) in [(13, 17, 3, 5), (8, 8, 0, 0), (11, 6, 7, 1)]:
        x = rng.normal(size=(h, w, 4)).astype(np.float32)
        canvas = np.zeros((32, 32, 4), np.float32)
        canvas[oy:oy + h, ox:ox + w] = x
        win = np.array([[oy, ox, h, w]], np.int32)
        got, got_win = batched_window_avgpool_s2(
            jnp.asarray(canvas[None]), jnp.asarray(win), (16, 16)
        )
        want = F.avg_pool2d(
            torch.from_numpy(x.transpose(2, 0, 1))[None], kernel_size=3,
            stride=2, padding=1,
        )[0].numpy().transpose(1, 2, 0)
        gh, gw = want.shape[:2]
        assert tuple(np.asarray(got_win)[0, 2:]) == (gh, gw)
        np.testing.assert_allclose(np.asarray(got)[0, :gh, :gw], want,
                                   atol=1e-6, rtol=1e-6)
        assert np.abs(np.asarray(got)[0, gh:]).max() == 0.0
        assert np.abs(np.asarray(got)[0, :, gw:]).max() == 0.0
