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
