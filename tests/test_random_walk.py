"""Random-walk refinement tests: index-table parity with the reference's
PathIndex (pure numpy, importable) + structural properties of the walk."""

import numpy as np
import pytest

import jax.numpy as jnp

from muscle_tpu.ops import propagate_to_edge
from muscle_tpu.ops.random_walk import PathIndex, edge_to_affinity, affinity_to_dense

from reference_loader import load_reference

src = load_reference()
from src.indexing import PathIndex as RefPathIndex  # noqa: E402


def test_path_index_matches_reference():
    size = (17, 22)
    mine = PathIndex(radius=5, size=size)
    ref = RefPathIndex(radius=5, default_size=size)
    assert len(mine.path_indices) == len(ref.path_indices)
    for a, b in zip(mine.path_indices, ref.path_indices):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(mine.src_indices, ref.src_indices)
    np.testing.assert_array_equal(mine.dst_indices, ref.dst_indices)
    np.testing.assert_array_equal(mine.search_dst, ref.search_dst)


def test_affinity_dense_structure():
    size = (13, 18)
    pi = PathIndex(radius=5, size=size)
    rng = np.random.default_rng(0)
    edge = rng.uniform(0, 1, size=(size[0] * size[1],)).astype(np.float32)
    aff = edge_to_affinity(jnp.asarray(edge), pi)
    dense = np.asarray(affinity_to_dense(aff, pi))
    # symmetric with unit diagonal
    np.testing.assert_allclose(dense, dense.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(dense), 1.0, atol=1e-6)
    assert dense.min() >= -1e-6 and dense.max() <= 1.0 + 1e-6


def test_propagate_vector_equals_power():
    rng = np.random.default_rng(1)
    h = w = 10
    cam = rng.uniform(0, 1, size=(3, h, w)).astype(np.float32)
    edge = rng.uniform(0, 0.5, size=(h, w)).astype(np.float32)
    rv = np.asarray(
        propagate_to_edge(jnp.asarray(cam), jnp.asarray(edge), exp_times=3, method="vector")
    )
    rp = np.asarray(
        propagate_to_edge(jnp.asarray(cam), jnp.asarray(edge), exp_times=3, method="power")
    )
    np.testing.assert_allclose(rv, rp, rtol=2e-3, atol=1e-5)


def test_propagate_stencil_equals_vector():
    """The scatter-free/gather-free stencil walk must reproduce the
    matrix-based walk (same math, different accumulation order)."""
    rng = np.random.default_rng(7)
    h, w = 12, 9
    cam = rng.uniform(0, 1, size=(3, h, w)).astype(np.float32)
    edge = rng.uniform(0, 0.7, size=(h, w)).astype(np.float32)
    rv = np.asarray(
        propagate_to_edge(jnp.asarray(cam), jnp.asarray(edge), exp_times=4, method="vector")
    )
    rs = np.asarray(
        propagate_to_edge(jnp.asarray(cam), jnp.asarray(edge), exp_times=4, method="stencil")
    )
    np.testing.assert_allclose(rs, rv, rtol=2e-4, atol=1e-6)


def test_propagate_stencil_pallas_equals_xla():
    """The VMEM-resident Pallas step loop (interpret mode on CPU) must
    reproduce the XLA stencil walk — the lane-aligned padded domain +
    circular-roll formulation is exact (ops/pallas/stencil_walk.py)."""
    from muscle_tpu.ops.random_walk import propagate_to_edge_stencil

    rng = np.random.default_rng(9)
    h, w = 12, 9
    cam = rng.uniform(0, 1, size=(3, h, w)).astype(np.float32)
    edge = rng.uniform(0, 0.7, size=(h, w)).astype(np.float32)
    base = np.asarray(
        propagate_to_edge_stencil(
            jnp.asarray(cam), jnp.asarray(edge), exp_times=4, pallas=False
        )
    )
    pal = np.asarray(
        propagate_to_edge_stencil(
            jnp.asarray(cam), jnp.asarray(edge), exp_times=4, pallas=True,
            interpret=True,
        )
    )
    np.testing.assert_allclose(pal, base, rtol=2e-4, atol=1e-6)


def test_propagate_output_sane():
    rng = np.random.default_rng(2)
    h = w = 8
    cam = rng.uniform(0, 1, size=(2, h, w)).astype(np.float32)
    edge = rng.uniform(0, 0.3, size=(h, w)).astype(np.float32)
    out = np.asarray(propagate_to_edge(jnp.asarray(cam), jnp.asarray(edge), exp_times=4))
    assert np.isfinite(out).all()
    assert out.min() >= 0.0
    assert out.max() > 0.0


def test_padding_with_walls_is_exact():
    """edge=1 padding isolates pad vertices: the walk on a padded grid must
    equal the walk on the bare grid (the batched-IRN static-shape trick)."""
    rng = np.random.default_rng(3)
    h = w = 9
    pad = 4
    cam = rng.uniform(0, 1, size=(2, h, w)).astype(np.float32)
    edge = rng.uniform(0, 0.4, size=(h, w)).astype(np.float32)

    cam_p = np.zeros((2, h + pad, w + pad), np.float32)
    cam_p[:, :h, :w] = cam
    edge_p = np.ones((h + pad, w + pad), np.float32)
    edge_p[:h, :w] = edge

    base = np.asarray(propagate_to_edge(jnp.asarray(cam), jnp.asarray(edge), exp_times=3))
    padded = np.asarray(
        propagate_to_edge(jnp.asarray(cam_p), jnp.asarray(edge_p), exp_times=3)
    )
    np.testing.assert_allclose(padded[:, :h, :w], base, rtol=1e-3, atol=1e-5)


def test_torch_oracle_vector_equals_squaring():
    """The full-size gate-3 oracle (gates.oracle_propagate_vector) iterates
    rw @ T 2^t times instead of squaring T t times — the same linear map;
    assert equality against the reference's literal matrix-squaring code at
    a small size (the verdict's precondition for trusting the full-size
    oracle)."""
    import torch

    from src import indexing as ref_indexing
    from muscle_tpu.gates import oracle_propagate_vector

    # the reference walk hardcodes .cuda() (indexing.py:84,111) — no-op it
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        rng = np.random.default_rng(7)
        h, w = 20, 28
        cam = torch.from_numpy(rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32))
        edge = torch.from_numpy(rng.uniform(0, 0.6, (1, h, w)).astype(np.float32))
        want = ref_indexing.propagate_to_edge(cam, edge, radius=5, beta=8, exp_times=4)
        got = oracle_propagate_vector(ref_indexing, cam, edge, radius=5, beta=8,
                                      exp_times=4)
    finally:
        torch.Tensor.cuda = orig_cuda
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-4, atol=1e-5)
