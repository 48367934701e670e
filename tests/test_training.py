"""Train-step smoke tests (tiny shapes, b1 backbone) + schedule/state units."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from muscle_tpu.models import MuSCLe
from muscle_tpu.training import (
    MCLConfig,
    ReduceLROnPlateau,
    SegConfig,
    create_train_state,
    mcl_train_step,
    seg_train_step,
)
from muscle_tpu.training.state import make_adam, set_learning_rate


def test_reduce_lr_on_plateau_max_mode():
    s = ReduceLROnPlateau(1e-4, factor=0.5, patience=0, min_lr=1e-5)
    assert s.step(50.0) == 1e-4  # first metric sets best
    assert s.step(55.0) == 1e-4  # improved
    assert s.step(54.0) == 5e-5  # worse -> halve
    assert s.step(54.0) == 2.5e-5
    for _ in range(5):
        lr = s.step(1.0)
    assert lr == 1e-5  # floor


def test_adam_matches_torch_semantics():
    """make_adam folds L2 into the gradient pre-moments (torch Adam)."""
    import torch

    # values chosen so g + wd*w stays far from 0 (at exact cancellation
    # Adam's eps-normalised step is numerically ill-defined)
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g0 = np.array([0.1, 0.2, -0.7], np.float32)
    lr, wd = 1e-2, 1e-1

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    tw.grad = torch.from_numpy(g0.copy())
    opt.step()

    tx = make_adam(lr, wd)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g0)}, opt_state, params)
    new_w = np.asarray(params["w"] + updates["w"])
    np.testing.assert_allclose(new_w, tw.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_irn_losses_match_reference():
    """irn_losses == the reference AffinityDisplacementLoss raw terms
    (resnet50_irn.py:143-212) under the IRN-lineage masked normalisation
    (whole-batch mask sums; displacement terms / 2*sum(mask))."""
    import importlib

    import torch

    from tests.reference_loader import load_reference

    load_reference()
    ref_irn = importlib.import_module("src.backbones.resnet50_irn")
    ref_idx = importlib.import_module("src.indexing")
    import src.backbones.resnet50 as ref_r50

    orig = ref_r50.resnet50
    ref_r50.resnet50 = lambda pretrained=True, **kw: orig(pretrained=False, **kw)
    try:
        g = 16
        tpi = ref_idx.PathIndex(radius=5, default_size=(g, g))
        tmod = ref_irn.AffinityDisplacementLoss(tpi)
    finally:
        ref_r50.resnet50 = orig

    from muscle_tpu.ops.random_walk import PathIndex
    from muscle_tpu.training.irn import irn_losses

    pi = PathIndex(5, (g, g))
    n, v = 2, g * g
    rng = np.random.default_rng(3)
    edge = rng.normal(size=(n, v)).astype(np.float32)
    dp = rng.normal(size=(n, v, 2)).astype(np.float32)

    # reference raw per-pair tensors
    t_edge = torch.from_numpy(edge)
    t_dp = torch.from_numpy(dp.reshape(n, g, g, 2).transpose(0, 3, 1, 2))
    aff_t = tmod.to_affinity(torch.sigmoid(t_edge))  # (N, D, P)
    pos_loss_t = -torch.log(aff_t + 1e-5)
    neg_loss_t = -torch.log(1.0 + 1e-5 - aff_t)
    pair_disp_t = tmod.to_pair_displacement(t_dp)  # (N, 2, D, P)
    dp_fg_t = tmod.to_displacement_loss(pair_disp_t)
    dp_bg_t = torch.abs(pair_disp_t)

    shape = aff_t.shape  # (N, D, P)
    bg = (rng.uniform(size=shape) < 0.3).astype(np.float32)
    fg = ((rng.uniform(size=shape) < 0.3).astype(np.float32)) * (1 - bg)
    neg = ((rng.uniform(size=shape) < 0.3).astype(np.float32)) * (1 - bg) * (1 - fg)
    t_bg, t_fg, t_neg = (torch.from_numpy(m) for m in (bg, fg, neg))

    # the lineage normalisation over the reference's raw terms
    pos_aff = (t_bg * pos_loss_t).sum() / (t_bg.sum() + 1e-5) / 2 + (
        t_fg * pos_loss_t
    ).sum() / (t_fg.sum() + 1e-5) / 2
    neg_aff = (t_neg * neg_loss_t).sum() / (t_neg.sum() + 1e-5)
    dp_fg = (dp_fg_t * t_fg.unsqueeze(1)).sum() / (2 * t_fg.sum() + 1e-5)
    dp_bg = (dp_bg_t * t_bg.unsqueeze(1)).sum() / (2 * t_bg.sum() + 1e-5)
    total_t = (pos_aff + neg_aff) / 2 + (dp_fg + dp_bg) / 2

    total_j, metrics = irn_losses(
        jnp.asarray(edge), jnp.asarray(dp),
        jnp.asarray(bg), jnp.asarray(fg), jnp.asarray(neg), pi,
    )
    np.testing.assert_allclose(float(metrics["loss_aff_pos"]), float(pos_aff), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["loss_aff_neg"]), float(neg_aff), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["loss_dp_fg"]), float(dp_fg), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["loss_dp_bg"]), float(dp_bg), rtol=1e-5)
    np.testing.assert_allclose(float(total_j), float(total_t), rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_batch():
    rng = np.random.default_rng(0)
    b, s = 2, 32
    label = np.zeros((b, 20), np.float32)
    label[0, 3] = 1
    label[1, 5] = 1
    return {
        "img": rng.normal(size=(b, s, s, 3)).astype(np.float32),
        "view1": rng.normal(size=(b, s, s, 3)).astype(np.float32),
        "view2": rng.normal(size=(b, s, s, 3)).astype(np.float32),
        "coord1": np.array([[2, 2, 20, 20], [0, 0, 24, 18]], np.int32),
        "coord2": np.array([[4, 6, 20, 20], [2, 2, 24, 18]], np.int32),
        "label": label,
        "mask": jax.nn.softmax(
            jnp.asarray(rng.normal(size=(b, s, s, 21)).astype(np.float32)), -1
        ),
    }


def test_mcl_train_step_updates_params(tiny_batch):
    model = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    rng = jax.random.key(0)
    variables = model.init({"params": rng}, jnp.zeros((1, 32, 32, 3)), mode="cam")
    tx = make_adam(1e-4, 5e-5)
    state = create_train_state(variables, tx)
    # the step donates its input state — snapshot to host first
    old_params = jax.device_get(state.params)
    old_stats = jax.device_get(state.batch_stats)

    new_state, metrics = mcl_train_step(
        model, tx, state, tiny_batch, rng, MCLConfig(use_imc=True)
    )
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), new_state.params, old_params),
    )
    assert delta > 0
    # BN running stats updated by the train-mode forward
    bs_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).sum()), new_state.batch_stats, old_stats
        ),
    )
    assert bs_delta > 0


def test_seg_train_step_runs(tiny_batch):
    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True
    )
    rng = jax.random.key(0)
    variables = model.init({"params": rng}, jnp.zeros((1, 32, 32, 3)), mode="seg")
    tx = make_adam(1e-5, 1e-5)
    state = create_train_state(variables, tx)
    cfg = SegConfig(lamb=5e-2, step=3, k=8)
    new_state, metrics = seg_train_step(model, tx, state, tiny_batch, rng, cfg)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_set_learning_rate_roundtrip():
    tx = make_adam(1e-4, 0.0)
    params = {"w": jnp.zeros(3)}
    state = create_train_state({"params": params}, tx)
    state = set_learning_rate(state, 5e-5)
    assert float(state.opt_state.hyperparams["learning_rate"]) == pytest.approx(5e-5)
