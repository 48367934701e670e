"""Pallas banded-walk kernel vs the plain dense iteration (interpret mode
on the CPU mesh; the compiled kernel runs on the real chip in bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from muscle_tpu.ops import propagate_to_edge
from muscle_tpu.ops.pallas import banded_random_walk, walk_band


def test_banded_matches_dense_iteration():
    rng = np.random.default_rng(0)
    v, c, band = 600, 5, 37
    # random banded column-stochastic matrix
    t = np.zeros((v, v), np.float32)
    for j in range(v):
        lo, hi = max(0, j - band), min(v, j + band + 1)
        col = rng.uniform(0, 1, hi - lo)
        t[lo:hi, j] = col / col.sum()
    x = rng.uniform(0, 1, (c, v)).astype(np.float32)

    steps = 8
    want = x.copy()
    for _ in range(steps):
        want = want @ t

    got = np.asarray(
        banded_random_walk(
            jnp.asarray(x), jnp.asarray(t), steps=steps, band=band,
            block_cols=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_propagate_banded_method():
    rng = np.random.default_rng(1)
    h = w = 12
    cam = rng.uniform(0, 1, size=(3, h, w)).astype(np.float32)
    edge = rng.uniform(0, 0.5, size=(h, w)).astype(np.float32)
    base = np.asarray(
        propagate_to_edge(jnp.asarray(cam), jnp.asarray(edge), exp_times=3, method="vector")
    )
    banded = np.asarray(
        propagate_to_edge(
            jnp.asarray(cam), jnp.asarray(edge), exp_times=3, method="banded_interpret"
        )
    )
    np.testing.assert_allclose(banded, base, rtol=2e-3, atol=1e-5)


def test_walk_band_value():
    assert walk_band(128, radius=5) == 4 * 128 + 4
