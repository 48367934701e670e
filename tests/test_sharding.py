"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from muscle_tpu.parallel import (
    data_sharding,
    local_batch_slice,
    make_mesh,
    replicate,
    shard_batch,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    batch = {"x": np.arange(16 * 4, dtype=np.float32).reshape(16, 4)}
    dev = shard_batch(mesh, batch)
    assert dev["x"].sharding == data_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(dev["x"]), batch["x"])


def test_data_parallel_grad_matches_single_device():
    """A toy data-parallel loss under the mesh must equal the single-device
    value and gradient (XLA inserts the cross-chip reductions)."""
    mesh = make_mesh()
    w = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32))
    x = np.random.default_rng(1).normal(size=(16, 4)).astype(np.float32)
    y = np.random.default_rng(2).normal(size=(16, 3)).astype(np.float32)

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, jnp.asarray(x), jnp.asarray(y))

    with mesh:
        wd = replicate(mesh, w)
        xd = jax.device_put(jnp.asarray(x), data_sharding(mesh))
        yd = jax.device_put(jnp.asarray(y), data_sharding(mesh))
        g_mesh = jax.jit(jax.grad(loss))(wd, xd, yd)
    np.testing.assert_allclose(np.asarray(g_mesh), np.asarray(g_single), rtol=1e-5)


def test_local_batch_slice():
    s = local_batch_slice(32, process_index=1, process_count=4)
    assert (s.start, s.stop) == (8, 16)
    with pytest.raises(ValueError):
        local_batch_slice(30, process_index=0, process_count=4)


def test_sharded_random_walk_matches_single_device():
    """Column-sharded transition matrix + per-step all-gather must match
    the single-device walk (SURVEY §2.5(c))."""
    from muscle_tpu.ops import propagate_to_edge, propagate_to_edge_sharded

    rng = np.random.default_rng(5)
    h, w = 8, 16  # V=128, divisible by 8 devices
    cam = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
    edge = jnp.asarray(rng.uniform(0, 0.5, (h, w)).astype(np.float32))
    base = np.asarray(propagate_to_edge(cam, edge, exp_times=3))
    mesh = make_mesh()
    sharded = np.asarray(
        propagate_to_edge_sharded(cam, edge, mesh, exp_times=3)
    )
    np.testing.assert_allclose(sharded, base, rtol=2e-3, atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_trains():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
