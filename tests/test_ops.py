"""Tests for CRF (XLA + native) and exact EMD."""

import numpy as np
import pytest

import jax.numpy as jnp

from muscle_tpu.ops import mean_field_crf
from muscle_tpu.ops.exact_crf import dense_crf
from muscle_tpu.ops.exact_emd import exact_emd


def _two_region_problem(h=48, w=64, l=21):
    rng = np.random.default_rng(0)
    img = np.zeros((h, w, 3), np.uint8)
    img[:, : w // 2] = [200, 40, 40]
    img[:, w // 2 :] = [40, 40, 200]
    img = np.clip(img.astype(int) + rng.integers(-15, 15, img.shape), 0, 255).astype(np.uint8)
    probs = np.full((h, w, l), 1e-3, np.float32)
    probs[:, : w // 2, 1] = 0.5
    probs[:, w // 2 :, 2] = 0.5
    probs[..., 0] = 0.3
    # salt the unaries with noise the CRF should clean up
    flip = rng.random((h, w)) < 0.1
    probs[flip] = probs[flip][:, ::-1]
    probs /= probs.sum(-1, keepdims=True)
    return img, probs


def test_native_crf_cleans_noise():
    img, probs = _two_region_problem()
    out = dense_crf(img, probs.transpose(2, 0, 1), t=4).transpose(1, 2, 0)
    pred = out.argmax(-1)
    h, w = pred.shape
    assert (pred[:, : w // 2] == 1).mean() > 0.95
    assert (pred[:, w // 2 :] == 2).mean() > 0.95
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)


def test_native_lattice_bandwidth():
    """Impulse response of the native permutohedral filter matches the
    brute-force Gaussian (regression: the elevation scale was inverted,
    making effective sigma ~3.5-10x too wide and coupling globally)."""
    h = w = 41
    img = np.zeros((h, w, 3), np.uint8)
    p = np.full((2, h, w), 0.5, np.float32)
    p[1, 20, 20], p[0, 20, 20] = 0.9, 0.1
    # gaussian kernel only (compat_b=0 via direct lib call is private; use
    # dense_crf with a uniform image so bilateral == wide spatial and
    # gauge the gaussian by the sharp center of the summed response)
    import ctypes

    from muscle_tpu.ops.native_lib import load

    lib = load()
    out = np.empty_like(p)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.muscle_dense_crf(
        p.ctypes.data_as(f32p),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w, 2, 1, 3.0, 1.0, 50.0, 5.0, 0.0, 1.0,
        out.ctypes.data_as(f32p),
    )
    lo = np.log(out[1] / out[0]) - np.log(p[1] / p[0])
    yy, xx = np.indices((h, w))
    k = np.exp(-((yy - 20) ** 2 + (xx - 20) ** 2) / 18.0)
    bf = 0.8 * k / k.sum()  # symmetric normalisation ~ 1/sum(k)
    band = slice(14, 27)
    np.testing.assert_allclose(lo[20, band], bf[20, band], atol=3e-3)
    # relative shape: half-width at half max within 1 cell of sigma*1.18
    prof = lo[20] / lo[20].max()
    hwhm = np.abs(np.where(prof > 0.5)[0] - 20).max()
    assert 2 <= hwhm <= 5, hwhm


def test_crf_preserves_blob_on_textured_image():
    """A confident 20x20 foreground blob must survive mean field on a
    noise image (regression for the lattice-bandwidth bug)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    from muscle_tpu.ops.exact_crf import dense_crf_label

    labels = np.zeros((60, 80), np.uint8)
    labels[10:30, 10:30] = 1
    refined = dense_crf_label(img, labels, t=10, n_labels=2)
    kept = (refined == 1)[10:30, 10:30].mean()
    assert kept > 0.9, kept
    # and the soft-unary variant keeps a majority of it
    probs = np.full((2, 60, 80), 0.3, np.float32)
    probs[0] = 0.7
    probs[1, 10:30, 10:30], probs[0, 10:30, 10:30] = 0.7, 0.3
    out = dense_crf(img, probs, t=4, confidence=1.0)
    assert (out.argmax(0) == 1)[10:30, 10:30].mean() > 0.5


def test_xla_crf_agrees_with_native():
    img, probs = _two_region_problem()
    native = dense_crf(img, probs.transpose(2, 0, 1), t=2).transpose(1, 2, 0)
    xla = np.asarray(mean_field_crf(jnp.asarray(probs), jnp.asarray(img), t=2))
    # different bilateral approximations — compare argmax agreement
    agree = (native.argmax(-1) == xla.argmax(-1)).mean()
    assert agree > 0.9, f"argmax agreement only {agree:.3f}"


def test_exact_emd_matches_bruteforce():
    rng = np.random.default_rng(1)
    cost = rng.uniform(0, 1, (5, 7)).astype(np.float32)
    w1 = rng.uniform(0.2, 1.0, 5).astype(np.float32)
    w2 = rng.uniform(0.2, 1.0, 7).astype(np.float32)
    val, flow = exact_emd(cost, w1, w2, return_flow=True)
    # flow satisfies marginals
    s = (np.maximum(w1, 0) + 1e-5)
    d = (np.maximum(w2, 0) + 1e-5)
    np.testing.assert_allclose(flow.sum(1), s / s.sum(), atol=1e-5)
    np.testing.assert_allclose(flow.sum(0), d / d.sum(), atol=1e-5)
    # optimality vs scipy linprog
    from scipy.optimize import linprog

    n, m = cost.shape
    a_eq = np.zeros((n + m, n * m))
    for i in range(n):
        a_eq[i, i * m : (i + 1) * m] = 1
    for j in range(m):
        a_eq[n + j, j::m] = 1
    b_eq = np.concatenate([s / s.sum(), d / d.sum()])
    res = linprog(cost.reshape(-1), A_eq=a_eq, b_eq=b_eq, method="highs")
    assert abs(val - res.fun) < 1e-5
