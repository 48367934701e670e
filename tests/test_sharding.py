"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import os

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


def test_cam_engine_mesh_sharded_matches_single():
    """CamTTAEngine(mesh=...) shards the TTA batch over the 'data' axis
    (the slice-scaling claim behind bench.py's x8 extrapolation) — outputs
    must match the single-device engine, images being independent."""
    from PIL import Image

    from muscle_tpu.inference import CamTTAEngine
    from muscle_tpu.models import MuSCLe

    model = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    variables = model.init(
        {"params": jax.random.key(3)}, jnp.zeros((1, 32, 32, 3)), mode="cam"
    )
    rng = np.random.default_rng(21)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (48 + 2 * i, 40, 3), dtype=np.uint8))
        for i in range(8)
    ]
    names = [f"i{i}" for i in range(8)]
    labels = []
    for i in range(8):
        lab = np.zeros(20, np.float32)
        lab[i % 20] = 1.0
        labels.append(lab)
    kw = dict(scales=(0.5, 1.0), out_side=64, max_side=62, device_tta=True)
    base = CamTTAEngine(model, variables, **kw).run_batch(imgs, names, labels)
    sharded = CamTTAEngine(model, variables, mesh=make_mesh(), **kw).run_batch(
        imgs, names, labels
    )
    for x, y, lab in zip(base, sharded, labels):
        np.testing.assert_allclose(x["score"], y["score"], atol=1e-5)
        for c in np.nonzero(lab)[0]:
            np.testing.assert_allclose(
                x["sgc"][c].astype(np.float32), y["sgc"][c].astype(np.float32),
                atol=1e-4,
            )

    # non-divisible batch falls back to replicated placement, same outputs
    part = CamTTAEngine(model, variables, mesh=make_mesh(), **kw).run_batch(
        imgs[:3], names[:3], labels[:3]
    )
    for x, y, lab in zip(base[:3], part, labels[:3]):
        np.testing.assert_allclose(x["score"], y["score"], atol=1e-5)


def test_seg_engine_mesh_sharded_matches_single():
    from PIL import Image

    from muscle_tpu.inference import SegTTAEngine
    from muscle_tpu.models import MuSCLe

    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True
    )
    variables = model.init(
        {"params": jax.random.key(4)}, jnp.zeros((1, 32, 32, 3)), mode="seg"
    )
    rng = np.random.default_rng(22)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (50, 40, 3), dtype=np.uint8))
        for _ in range(8)
    ]
    names = [f"i{i}" for i in range(8)]
    kw = dict(scales=(0.5, 1.0), out_side=64, max_side=56, device_tta=True)
    base = SegTTAEngine(model, variables, **kw).run_batch(imgs, names)
    sharded = SegTTAEngine(model, variables, mesh=make_mesh(), **kw).run_batch(
        imgs, names
    )
    for x, y in zip(base, sharded):
        np.testing.assert_allclose(x["probs"], y["probs"], atol=1e-5)


def test_cam_engine_spatial_sharded_matches_single():
    """shard_spatial: batch over 'data' AND image height over 'model'
    (GSPMD halo-exchange convs) — outputs must match the unsharded
    engine.  4 images on a (2 data, 4 model) mesh exercises a batch
    smaller than the device count, the case pure DP can't scale."""
    from PIL import Image

    from muscle_tpu.inference import CamTTAEngine
    from muscle_tpu.models import MuSCLe

    model = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    variables = model.init(
        {"params": jax.random.key(5)}, jnp.zeros((1, 32, 32, 3)), mode="cam"
    )
    rng = np.random.default_rng(23)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (44 + 4 * i, 40, 3), dtype=np.uint8))
        for i in range(4)
    ]
    names = [f"i{i}" for i in range(4)]
    labels = []
    for i in range(4):
        lab = np.zeros(20, np.float32)
        lab[(3 * i) % 20] = 1.0
        labels.append(lab)
    kw = dict(scales=(0.5, 1.0), out_side=64, max_side=62, device_tta=True)
    base = CamTTAEngine(model, variables, **kw).run_batch(imgs, names, labels)
    spat = CamTTAEngine(
        model, variables, mesh=make_mesh(model_axis=4), shard_spatial=True, **kw
    ).run_batch(imgs, names, labels)
    for x, y, lab in zip(base, spat, labels):
        np.testing.assert_allclose(x["score"], y["score"], atol=1e-4)
        for c in np.nonzero(lab)[0]:
            np.testing.assert_allclose(
                x["sgc"][c].astype(np.float32), y["sgc"][c].astype(np.float32),
                atol=2e-4,
            )


def test_seg_engine_spatial_sharded_matches_single():
    from PIL import Image

    from muscle_tpu.inference import SegTTAEngine
    from muscle_tpu.models import MuSCLe

    model = MuSCLe(
        backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True
    )
    variables = model.init(
        {"params": jax.random.key(6)}, jnp.zeros((1, 32, 32, 3)), mode="seg"
    )
    rng = np.random.default_rng(24)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (50, 40, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    names = ["a", "b"]
    kw = dict(scales=(0.5, 1.0), out_side=64, max_side=56, device_tta=True)
    base = SegTTAEngine(model, variables, **kw).run_batch(imgs, names)
    spat = SegTTAEngine(
        model, variables, mesh=make_mesh(model_axis=4), shard_spatial=True, **kw
    ).run_batch(imgs, names)
    for x, y in zip(base, spat):
        np.testing.assert_allclose(x["probs"], y["probs"], atol=1e-4)


def test_shard_spatial_requires_model_axis():
    from muscle_tpu.inference import CamTTAEngine
    from muscle_tpu.models import MuSCLe

    model = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    variables = model.init(
        {"params": jax.random.key(7)}, jnp.zeros((1, 32, 32, 3)), mode="cam"
    )
    with pytest.raises(ValueError):
        CamTTAEngine(model, variables, mesh=make_mesh(), shard_spatial=True)
    with pytest.raises(ValueError):
        CamTTAEngine(model, variables, shard_spatial=True)


@pytest.mark.slow
def test_dryrun_multichip_trains():
    """Runs the driver's multichip check exactly as the driver does: a
    fresh torch-free subprocess on a forced 8-device CPU mesh.  In-process
    execution under pytest segfaulted twice inside jaxlib's compile-cache
    serialize (put_executable_and_time) when torch was co-loaded — the
    subprocess isolates that and is the more faithful contract anyway."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        OMP_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) subprocess failed rc={proc.returncode}\n"
        f"stdout tail:\n{proc.stdout[-2000:]}\nstderr tail:\n{proc.stderr[-2000:]}"
    )
    assert "done" in proc.stdout


@pytest.mark.slow
def test_weak_scaling_program_property():
    """Weak-scaling backing for the x8 bench projection (round-3 verdict
    item 8, SURVEY §2.5a): the 8-device data-parallel MCL step must run
    the SAME total compute as the single-device step on the same global
    batch (hidden replication would inflate FLOPs), and its only
    cross-device traffic may be the gradient all-reduce plus the small
    IMC embedding gather — no activation-sized all-gathers.  Deterministic
    compiled-program inspection; the wall-clock companion rows live in
    tools/weak_scaling.py + STATUS.md."""
    import re

    from muscle_tpu.models import MuSCLe
    from muscle_tpu.training import MCLConfig, create_train_state, mcl_train_step
    from muscle_tpu.training.state import make_adam

    crop, bs = 48, 8
    model = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    rng = jax.random.key(0)
    variables = model.init({"params": rng}, jnp.zeros((1, crop, crop, 3)), mode="cam")
    tx = make_adam(1e-4, 5e-5)
    cfg = MCLConfig(use_imc=True)
    rng_np = np.random.default_rng(0)
    label = np.zeros((bs, 20), np.float32)
    label[np.arange(bs), np.arange(bs) % 20] = 1.0
    batch = {
        "img": rng_np.normal(size=(bs, crop, crop, 3)).astype(np.float32),
        "label": label,
    }

    def flops_of(lowered):
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"]), lowered.compile().as_text()

    state1 = create_train_state(variables, tx)
    f1, _ = flops_of(mcl_train_step.lower(
        model, tx, state1, jax.tree.map(jnp.asarray, batch), rng, cfg))

    mesh = make_mesh()
    with mesh:
        state8 = replicate(mesh, create_train_state(variables, tx))
        sb = shard_batch(mesh, batch)
        f8, hlo = flops_of(mcl_train_step.lower(model, tx, state8, sb, rng, cfg))

    # same global batch => same compute; allow 15% for partitioner fusion
    # differences, none for per-device replication (that would be ~8x)
    assert f8 <= 1.15 * f1, (f8, f1)
    assert "all-reduce" in hlo  # the gradient psum exists
    # any all-gather must be small (IMC embeddings, O(B*C)), never an
    # activation/gradient-sized tensor
    for shape in re.findall(r"= \w+\[([\d,]*)\][^=]*all-gather", hlo):
        n = int(np.prod([int(d) for d in shape.split(",") if d]))
        assert n <= 1_000_000, f"activation-sized all-gather: [{shape}]"
