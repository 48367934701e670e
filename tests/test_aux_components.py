"""Tests for auxiliary components: IRN training losses, affinity labels,
static EMD, info_nce, edge support, visualisation, weighting, schedules."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from muscle_tpu.losses import (
    grayscale_edge,
    info_nce,
    static_matching_emd,
    straight_through_argmax,
    unit_vectors,
)
from muscle_tpu.ops.affinity_labels import affinity_labels_from_indices
from muscle_tpu.ops.random_walk import PathIndex
from muscle_tpu.training.irn import IRNTrainConfig, irn_losses, _grid_path_index
from muscle_tpu.training.schedule import poly_schedule
from muscle_tpu.utils import jet_colormap, topk_accuracy
from muscle_tpu.data.voc12 import class_frequency_sample_weights


def test_affinity_labels_partition():
    pi = PathIndex(radius=5, size=(16, 16))
    lab = np.zeros((16, 16), np.int32)
    lab[:, 8:] = 3  # two regions
    lab[0, :] = 255  # void row
    bg, fg, neg = affinity_labels_from_indices(jnp.asarray(lab.reshape(-1)), pi)
    bg, fg, neg = np.asarray(bg), np.asarray(fg), np.asarray(neg)
    # masks are disjoint
    assert ((bg + fg + neg) <= 1.0 + 1e-6).all()
    assert bg.sum() > 0 and fg.sum() > 0 and neg.sum() > 0
    # neg pairs only across the boundary (within radius of the split)
    total_pairs = bg.size
    assert neg.sum() < 0.5 * total_pairs
    # void row pairs are excluded from every mask
    assert (bg + fg + neg).max() <= 1.0


def test_irn_losses_finite_and_meaningful():
    cfg = IRNTrainConfig(crop_size=64)
    pi = _grid_path_index(cfg)
    g = cfg.grid
    rng = np.random.default_rng(0)
    lab = np.zeros((g, g), np.int32)
    lab[:, g // 2 :] = 1
    bg, fg, neg = affinity_labels_from_indices(jnp.asarray(lab.reshape(-1)), pi)

    # an edge wall on the class boundary must beat the same wall misplaced
    # in the middle of a region
    def wall(col):
        e = np.full((g, g), -6.0, np.float32)
        e[:, col : col + 2] = 6.0
        return jnp.asarray(e.reshape(-1))

    dp = jnp.zeros((1, g * g, 2))
    loss_good, m = irn_losses(wall(g // 2 - 1)[None], dp, bg[None], fg[None], neg[None], pi)
    loss_bad, _ = irn_losses(wall(g // 4)[None], dp, bg[None], fg[None], neg[None], pi)
    assert np.isfinite(float(loss_good)) and float(loss_good) < float(loss_bad)
    assert float(m["loss_dp_fg"]) > 0  # zero field misses the fg targets


def test_static_matching_emd_runs():
    rng = np.random.default_rng(0)
    vw = jax.nn.softmax(jnp.asarray(rng.normal(size=(3, 64, 64, 21)).astype(np.float32)), -1)
    c = jnp.asarray([[0, 0, 32, 32]] * 3, jnp.int32)
    val = static_matching_emd(vw, vw, c, c)
    # identical views -> cost 1 - <x, x>; x not unit-norm so just finite
    assert np.isfinite(float(val))
    g = jax.grad(lambda v: static_matching_emd(v, vw, c, c))(vw)
    assert np.isfinite(np.asarray(g)).all()


def test_info_nce_prefers_aligned_positives():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    pos = q[:, None, :] + 0.01
    neg = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))
    aligned = float(info_nce(q, pos, neg))
    shuffled = float(info_nce(q, jnp.roll(q, 1, axis=0)[:, None, :], neg))
    assert aligned < shuffled


def test_grayscale_edge_detects_boundary():
    img = np.zeros((1, 32, 32, 3), np.float32)
    img[:, :, 16:] = 1.0  # normalised units; sharp vertical boundary
    e = np.asarray(grayscale_edge(jnp.asarray(img)))
    assert e[0, 16, 16, 0] > e[0, 16, 4, 0] * 5


def test_unit_vectors_norms():
    # odd bins use the reference's (1e-6, +-u) vectors whose norm is u,
    # not 1 (edge.py:99-106) — kept bit-faithful
    v = np.asarray(unit_vectors(jnp.arange(8)))
    norms = np.linalg.norm(v, axis=-1)
    u = 1.0 / np.sqrt(2.0)
    np.testing.assert_allclose(norms, [1, u, 1, u, 1, u, 1, u], atol=1e-3)


def test_straight_through_argmax():
    x = jnp.asarray([[0.1, 0.9, 0.3]])
    y = straight_through_argmax(x)
    assert float(y[0]) == 1.0
    g = jax.grad(lambda x: jnp.sum(straight_through_argmax(x) * 2.0))(x)
    assert np.asarray(g).sum() != 0  # gradient flows through


def test_poly_schedule_decay():
    s = poly_schedule(1e-2, 100)
    assert float(s(0)) == pytest.approx(1e-2)
    assert float(s(50)) == pytest.approx(1e-2 * 0.5**0.9, rel=1e-5)
    assert float(s(100)) == 0.0


def test_jet_colormap_endpoints():
    c = jet_colormap(np.asarray([0.0, 0.5, 1.0]))
    assert c[0, 2] > 100 and c[0, 0] == 0  # blue-ish at 0
    assert c[2, 0] > 100 and c[2, 2] == 0  # red-ish at 1


def test_topk_accuracy():
    scores = np.asarray([[0.9, 0.1, 0.5], [0.1, 0.8, 0.2]])
    target = np.asarray([[0, 0, 1], [0, 1, 0]])
    top1, top2 = topk_accuracy(scores, target, topk=(1, 2))
    assert top1 == 0.5 and top2 == 1.0


def test_class_frequency_sample_weights():
    labels = [np.eye(20, dtype=np.float32)[14], np.eye(20, dtype=np.float32)[9]]
    w = class_frequency_sample_weights(labels)
    assert w[1] > w[0]  # rare class (chair, 267) upweighted vs person (4155)


def test_get_indices_of_pairs_raster_parity():
    """Vectorised raster pair enumeration == reference pyutils
    (src/pyutils.py:137-176), including offset order."""
    from reference_loader import load_reference
    from muscle_tpu.ops.affinity_labels import get_indices_of_pairs_raster

    load_reference()
    from src import pyutils

    for radius, size in [(3, (7, 9)), (5, (11, 14))]:
        rf, rt = pyutils.get_indices_of_pairs(radius, size)
        mf, mt = get_indices_of_pairs_raster(radius, size)
        np.testing.assert_array_equal(rf, mf)
        np.testing.assert_array_equal(rt, mt)


def test_get_indices_of_pairs_circle_parity():
    from reference_loader import load_reference
    from muscle_tpu.ops.affinity_labels import get_indices_of_pairs_circle

    load_reference()
    from src import pyutils

    for radius, size in [(3, (8, 8)), (4, (10, 13))]:
        rf, rt = pyutils.get_indices_of_pairs_circle(radius, size)
        mf, mt = get_indices_of_pairs_circle(radius, size)
        np.testing.assert_array_equal(rf, mf)
        np.testing.assert_array_equal(rt, mt)


def test_get_indices_of_pairs_orient_bins():
    """The reference's orient=True path is buggy (masks test the boolean
    flag, collapsing all bins to 0 — DEVIATIONS.md); assert the corrected
    8-direction quantisation instead: known offsets land in known bins."""
    from muscle_tpu.ops.affinity_labels import get_indices_of_pairs_raster

    _, _, bins = get_indices_of_pairs_raster(5, (11, 11), orient=True)
    offs = [(0, x) for x in range(1, 5)] + [
        (y, x) for y in range(1, 5) for x in range(-4, 5)
        if x * x + y * y < 25
    ]
    by_off = dict(zip(offs, bins))
    assert by_off[(0, 1)] == 7  # angle 0
    assert by_off[(1, 1)] == 0  # pi/4
    assert by_off[(1, 0)] == 1  # pi/2
    assert by_off[(1, -1)] == 2  # 3pi/4
    assert set(bins) <= set(range(8))


def test_pytest_disables_persistent_cache_writes():
    """Guard for the conftest cache-write kill switch.

    jax 0.9 enables the persistent compilation cache by default, and
    cache-entry serialization with torch co-loaded segfaults jaxlib
    intermittently (CLAUDE.md).  conftest must keep writes out of reach
    for the whole pytest process; compile_cache.enable(readonly=True)
    must preserve that even if a test routes through it.
    """
    assert jax.config.jax_persistent_cache_min_compile_time_secs >= 1e9

    from muscle_tpu.utils.compile_cache import enable

    prior_dir = jax.config.jax_compilation_cache_dir
    try:
        enable(readonly=True)
        assert jax.config.jax_persistent_cache_min_compile_time_secs >= 1e9
    finally:
        jax.config.update("jax_compilation_cache_dir", prior_dir)


def test_pytest_serializes_cpu_codegen():
    """Guard for the conftest XLA:CPU codegen serialization.

    Big-module XLA:CPU compiles with torch co-loaded segfault jaxlib
    intermittently INSIDE backend.compile_and_load (4th observation
    2026-08-20 at test_seg_train_step_runs) — distinct from the
    cache-write serialize crash above.  conftest must pin the parallel
    codegen split to 1 before the backend initialises (XLA parses
    XLA_FLAGS at client creation), and serialize_cpu_codegen must not
    stack duplicate flags when called again.
    """
    import os

    from muscle_tpu.utils.compile_cache import _CODEGEN_FLAG, serialize_cpu_codegen

    flags = os.environ.get("XLA_FLAGS", "")
    assert _CODEGEN_FLAG in flags
    serialize_cpu_codegen()  # idempotent
    assert os.environ["XLA_FLAGS"].count("xla_cpu_parallel_codegen_split_count") == 1
