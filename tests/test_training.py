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
