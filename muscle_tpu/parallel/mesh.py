"""Device mesh + sharding utilities.

The reference is single-GPU (SURVEY §2.5: no torch.distributed, no
collectives anywhere); the TPU framework runs *everything* under a
`jax.sharding.Mesh` instead, so one code path covers 1 chip, a v5e-8 slice
(ICI), and multi-host slices (DCN):

* training: data-parallel over axis 'data' — gradients are reduced by XLA's
  collectives, no explicit psum needed under jit-with-shardings;
* CAM / seg TTA inference: the image stream is sharded over 'data';
* metrics: reduced with jnp sums under the same mesh.

Axis names are fixed: ('data',) by default; a 2-D ('data', 'model') mesh is
supported for the spatially-sharded random walk (the only memory-quadratic
op, SURVEY §5 long-context note).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    model_axis: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh; model axis defaults to size 1.

    With n_devices=None, uses all visible devices.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are visible"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model axis {model_axis}")
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def make_data_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Data-parallel mesh sized to the largest device count that divides
    the per-process batch (a batch of 6 on 8 chips uses 2; warns when
    devices go idle)."""
    import warnings

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n < len(devices):
        warnings.warn(
            f"batch size {batch_size} not divisible by {len(devices)} devices; "
            f"using a {n}-device data mesh"
        )
    return make_mesh(n, devices=devices)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard an NHWC batch over ('data', 'model'): batch over 'data' and
    image HEIGHT over 'model'.  Constraining the conv-stack input to this
    under jit makes GSPMD run every spatial conv sharded, inserting halo
    exchanges over ICI (and psums for the global reductions) — multi-chip
    scaling for batches SMALLER than the slice (latency, not just
    throughput; the single-GPU reference has no equivalent).  Use
    make_mesh(model_axis=k) with k > 1."""
    return NamedSharding(mesh, P("data", "model"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated (params, opt state)."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def local_batch_slice(global_batch: int, process_index=None, process_count=None):
    """Host data sharding: the slice of the global batch this process feeds
    (multi-host DCN; each host loads only its shard)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {pc} hosts")
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)
