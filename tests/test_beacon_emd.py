"""Behavioural tests for the BEACON field loss and the dynamic-matching EMD
(static TPU re-designs — no bitwise reference counterpart; see module
docstrings for the documented deviations)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from muscle_tpu.losses import FieldLossConfig, dynamic_matching_emd, field_loss


def _seg_problem(n=1, h=48, w=48, c=21, seed=0):
    rng = np.random.default_rng(seed)
    seg = np.full((n, h, w, c), -5.0, np.float32)
    # a sharp square of class 1 in the middle -> strong class boundary
    seg[..., 0] = 5.0
    seg[:, 12:36, 12:36, 1] = 10.0
    seg[:, 12:36, 12:36, 0] = -5.0
    mask = jax.nn.softmax(jnp.asarray(seg) * 1.0, axis=-1)
    dense = rng.normal(size=(n, h, w, 64)).astype(np.float32)
    label = np.zeros((n, c), np.float32)
    label[:, 0] = 1
    label[:, 1] = 1
    return jnp.asarray(seg), jnp.asarray(dense), jnp.asarray(mask), jnp.asarray(label)


def test_field_loss_finite_and_differentiable():
    seg, dense, mask, label = _seg_problem()
    cfg = FieldLossConfig(k=16, step=3)
    rng = jax.random.key(0)

    def f(d):
        loss, _ = field_loss(seg, d, mask, label, rng, cfg)
        return loss

    loss = f(dense)
    assert np.isfinite(float(loss))
    g = jax.grad(f)(dense)
    assert np.isfinite(np.asarray(g)).all()


def test_field_loss_magnitude_map():
    seg, dense, mask, label = _seg_problem()
    cfg = FieldLossConfig(k=16, step=3)
    _, mag = field_loss(seg, dense, mask, label, jax.random.key(0), cfg)
    mag = np.asarray(mag)[0]
    # gradient magnitude peaks on the square's boundary, not inside/outside
    boundary = mag[12, 12:36].mean()
    interior = mag[24, 20:28].mean()
    assert boundary > 10 * max(interior, 1e-6)


def test_field_loss_skips_absent_classes():
    seg, dense, mask, label = _seg_problem()
    cfg = FieldLossConfig(k=16, step=3)
    no_fg = label.at[:, 1].set(0.0)
    loss, _ = field_loss(seg, dense, mask, no_fg, jax.random.key(0), cfg)
    assert float(loss) == 0.0


def test_dynamic_matching_emd_runs_and_grads():
    rng = np.random.default_rng(0)
    n, hv, wv, c = 2, 64, 64, 21
    vw1 = jax.nn.softmax(jnp.asarray(rng.normal(size=(n, hv, wv, c)).astype(np.float32)), -1)
    vw2 = jax.nn.softmax(jnp.asarray(rng.normal(size=(n, hv, wv, c)).astype(np.float32)), -1)
    coord1 = jnp.asarray([[5, 5, 40, 40], [0, 0, 30, 25]], jnp.int32)
    coord2 = jnp.asarray([[10, 2, 40, 40], [3, 3, 30, 25]], jnp.int32)
    key = jax.random.key(1)

    def f(v):
        return dynamic_matching_emd(v, vw2, coord1, coord2, key)

    val = float(f(vw1))
    assert np.isfinite(val)
    g = jax.grad(f)(vw1)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_dynamic_matching_emd_skips_tiny_overlaps():
    rng = np.random.default_rng(0)
    vw = jax.nn.softmax(jnp.asarray(rng.normal(size=(1, 64, 64, 21)).astype(np.float32)), -1)
    tiny = jnp.asarray([[0, 0, 5, 5]], jnp.int32)  # below the 15px gate
    val = float(dynamic_matching_emd(vw, vw, tiny, tiny, jax.random.key(0)))
    assert val == 0.0
