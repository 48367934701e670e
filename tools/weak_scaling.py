"""CPU-mesh weak scaling of the data-parallel MCL train step.

Round-3 verdict item 8: every bench `vs_baseline` multiplies per-chip
throughput by 8 (SURVEY §2.5a: all stages are data-parallel over images);
this measures the actual cost of that assumption — step time at
1/2/4/8 mesh devices with a FIXED per-device batch, so perfect weak
scaling is a flat line and the deviation is the collective overhead
(one gradient psum per step; the losses are batch-local except IMC,
whose pair matrix is computed per shard on the gathered embeddings).

Caveat (documented with the numbers in STATUS.md): the N "devices" here
are XLA:CPU virtual devices TIMESHARING one host core, so the ideal
weak-scaled wall time is N * t_1 (N times the compute through one core),
and efficiency is measured as N*t_1/t_N.  The psum runs over shared
memory, not ICI.  What this measures is the PROGRAM property — that the
sharded step adds no hidden cross-device serialisation or replicated
compute beyond the one gradient psum; the ICI transfer cost for that
volume (one f32 gradient tree, ~26 MB for b1, ~1.4 ms at a v5e's
8x45 GB/s ICI) is negligible against a ~100 ms step by construction.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/weak_scaling.py [--per_device_batch 2] [--crop 96]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_scale(n_devices: int, per_device_bs: int, crop: int, steps: int) -> float:
    import jax
    import jax.numpy as jnp

    from muscle_tpu.models import MuSCLe
    from muscle_tpu.parallel import make_mesh, replicate, shard_batch
    from muscle_tpu.training import MCLConfig, create_train_state, mcl_train_step
    from muscle_tpu.training.state import make_adam

    mesh = make_mesh(n_devices)
    bs = per_device_bs * n_devices
    rng_np = np.random.default_rng(0)
    model = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    rng = jax.random.key(0)
    variables = model.init({"params": rng}, jnp.zeros((1, crop, crop, 3)), mode="cam")
    tx = make_adam(1e-4, 5e-5)
    state = create_train_state(variables, tx)
    label = np.zeros((bs, 20), np.float32)
    label[np.arange(bs), np.arange(bs) % 20] = 1.0
    batch = {
        "img": rng_np.normal(size=(bs, crop, crop, 3)).astype(np.float32),
        "label": label,
    }
    cfg = MCLConfig(use_imc=True)
    with mesh:
        state = replicate(mesh, state)
        sb = shard_batch(mesh, batch)
        for _ in range(2):  # compile + warmup
            state, m = mcl_train_step(model, tx, state, sb, rng, cfg)
            _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = mcl_train_step(model, tx, state, sb, rng, cfg)
        _ = float(m["loss"])
        return (time.perf_counter() - t0) * 1000.0 / steps


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--per_device_batch", default=2, type=int)
    p.add_argument("--crop", default=96, type=int)
    p.add_argument("--steps", default=6, type=int)
    p.add_argument("--devices", default="1,2,4,8", type=str)
    args = p.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        pass
    from muscle_tpu.utils.compile_cache import enable

    enable()

    rows = []
    t1 = None
    for n in (int(x) for x in args.devices.split(",")):
        ms = run_scale(n, args.per_device_batch, args.crop, args.steps)
        if t1 is None:
            t1 = ms
        # virtual devices timeshare one core: ideal weak-scaled time is
        # n * t_1, so efficiency = n*t_1/t_N (see module docstring)
        rows.append({
            "devices": n,
            "per_device_batch": args.per_device_batch,
            "ms_per_step": round(ms, 1),
            "weak_scaling_efficiency": round(n * t1 / ms, 3),
            "program_overhead_fraction": round(max(0.0, 1.0 - n * t1 / ms), 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"weak_scaling": rows}))


if __name__ == "__main__":
    main()
