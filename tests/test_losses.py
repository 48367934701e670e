"""Loss parity vs the torch reference (imported read-only with stubs)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from muscle_tpu.losses import (
    er_topk_loss,
    focal_loss,
    image_level_contrast,
    lsep_loss,
    pixpro_loss,
    sinkhorn_emd,
    soft_margin_loss,
)

from reference_loader import load_reference

src = load_reference()
from src import loss_multilabel as ref_losses  # noqa: E402


def test_focal_loss_parity(rng):
    probs = rng.uniform(0.01, 0.99, size=(6, 20)).astype(np.float32)
    target = (rng.random((6, 20)) < 0.2).astype(np.float32)
    want = ref_losses.FocalLoss()(torch.from_numpy(probs), torch.from_numpy(target)).item()
    got = float(focal_loss(jnp.asarray(probs), jnp.asarray(target)))
    assert abs(got - want) < 1e-5


def test_lsep_loss_parity(rng):
    pred = rng.uniform(0.01, 0.99, size=(5, 20)).astype(np.float32)
    target = (rng.random((5, 20)) < 0.25).astype(np.float32)
    want = ref_losses.Log_Sum_Exp_Pairwise_Loss(
        torch.from_numpy(pred.copy()), torch.from_numpy(target)
    ).numpy()
    got = np.asarray(lsep_loss(jnp.asarray(pred), jnp.asarray(target)))
    # f32 summation-order difference over the C^2 exp terms: ~5e-5
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_soft_margin_parity(rng):
    logits = rng.normal(size=(4, 20)).astype(np.float32)
    target = (rng.random((4, 20)) < 0.3).astype(np.float32)
    want = nn.MultiLabelSoftMarginLoss()(
        torch.from_numpy(logits), torch.from_numpy(target)
    ).item()
    got = float(soft_margin_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert abs(got - want) < 1e-5


def test_imc_parity(rng):
    emb = rng.normal(size=(8, 32)).astype(np.float32)
    # engineered labels: identical pairs, disjoint pairs, overlapping pairs
    label = np.zeros((8, 20), np.float32)
    label[0, [1, 3]] = 1
    label[1, [1, 3]] = 1  # positive with 0
    label[2, [5]] = 1  # disjoint with 0,1
    label[3, [6]] = 1
    label[4, [1]] = 1  # overlapping (neither pos nor neg vs 0)
    label[5, [7, 8]] = 1
    label[6, [9]] = 1
    label[7, [10]] = 1
    want = ref_losses.image_level_contrast(
        torch.from_numpy(emb), torch.from_numpy(label)
    )
    want = want.item() if torch.is_tensor(want) else float(want)
    got = float(image_level_contrast(jnp.asarray(emb), jnp.asarray(label)))
    assert abs(got - want) < 1e-4


def test_pixpro_parity(rng):
    fm1 = rng.normal(size=(2, 21, 32, 32)).astype(np.float32)
    fm2 = rng.normal(size=(2, 21, 32, 32)).astype(np.float32)
    coord1 = np.array([[3, 4, 10, 12], [0, 0, 20, 8]], np.int64)
    coord2 = np.array([[1, 2, 10, 12], [5, 9, 20, 8]], np.int64)
    want = ref_losses.PixPro(
        torch.from_numpy(fm1), torch.from_numpy(fm2),
        torch.from_numpy(coord1), torch.from_numpy(coord2),
    ).item()
    got = float(
        pixpro_loss(
            jnp.asarray(fm1.transpose(0, 2, 3, 1)),
            jnp.asarray(fm2.transpose(0, 2, 3, 1)),
            jnp.asarray(coord1.astype(np.int32)),
            jnp.asarray(coord2.astype(np.int32)),
        )
    )
    assert abs(got - want) < 1e-4


def test_sinkhorn_parity(rng):
    n, m = 12, 9
    cost = rng.uniform(0, 2, size=(n, m)).astype(np.float32)
    w1 = rng.uniform(0.1, 1.0, size=(1, n)).astype(np.float32)
    w2 = rng.uniform(0.1, 1.0, size=(1, m)).astype(np.float32)
    emd = ref_losses.EMD()
    want = emd.sinkhorn_logsumexp(
        torch.from_numpy(cost), torch.from_numpy(w1), torch.from_numpy(w2),
        reg=0.1, maxiter=10,
    ).item()
    got = float(
        sinkhorn_emd(jnp.asarray(cost), jnp.asarray(w1[0]), jnp.asarray(w2[0]), reg=0.1, maxiter=10)
    )
    assert abs(got - want) < 1e-4


def test_er_topk_parity(rng):
    cams = rng.uniform(0, 1, size=(2, 8, 8, 21)).astype(np.float32)
    sgcs = rng.uniform(0, 1, size=(2, 8, 8, 21)).astype(np.float32)
    valid = 5
    # reference inline: topk of |cams - sgcs| flattened per sample
    diff = torch.abs(torch.from_numpy(cams.transpose(0, 3, 1, 2)) - torch.from_numpy(sgcs.transpose(0, 3, 1, 2)))
    k = int(0.2 * valid * 8 * 8)
    want = torch.topk(torch.flatten(diff, start_dim=1), k=k, dim=-1)[0].mean().item()
    got = float(
        er_topk_loss(jnp.asarray(cams), jnp.asarray(sgcs), jnp.asarray(valid))
    )
    assert abs(got - want) < 1e-5


def test_sinkhorn_gradient_flows(rng):
    cost_np = rng.uniform(0, 2, size=(8, 8)).astype(np.float32)

    def f(c):
        w = jnp.ones((8,))
        return sinkhorn_emd(c, w, w)

    g = jax.grad(f)(jnp.asarray(cost_np))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
