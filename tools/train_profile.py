"""Decompose the MCL train-step time into host / transfer / device parts.

bench.py's bench_mcl_train measured ~558 ms/step (28.7 img/s) while the
round-1 microbenches put fwd+bwd at ~120 ms — this tool attributes the gap.

Phases measured:
  host_gen   — numpy uint8 batch generation (1 vCPU)
  transfer   — jax.device_put of the uint8 batch through the axon relay
  device     — the jitted step with a device-resident batch, loss fetched
               once after K chained steps (amortises the ~25 ms relay RTT)
  sync_loop  — the bench.py pattern (gen + transfer + step + scalar fetch
               every step) for an end-to-end cross-check

Run:  OMP_NUM_THREADS=1 python tools/train_profile.py [--steps 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--crop", type=int, default=448)
    args = ap.parse_args()

    from muscle_tpu.utils.compile_cache import enable

    enable()

    import jax
    import jax.numpy as jnp

    from muscle_tpu.models import MuSCLe
    from muscle_tpu.parallel import make_data_mesh_for_batch, replicate, shard_batch
    from muscle_tpu.training import MCLConfig, create_train_state, mcl_train_step
    from muscle_tpu.training.state import make_adam

    rng_np = np.random.default_rng(3)
    bs, crop = args.bs, args.crop
    model = MuSCLe(
        backbone_name="efficientnet-b3", mode="enc", last_pooling=False,
        dtype=jnp.bfloat16,
    )
    variables = jax.jit(
        lambda k: model.init({"params": k}, jnp.zeros((1, 64, 64, 3)), mode="cam")
    )(jax.random.key(0))
    tx = make_adam(1e-4, 5e-5)
    state = create_train_state(variables, tx)
    mesh = make_data_mesh_for_batch(bs)
    state = replicate(mesh, state)
    label = np.zeros((bs, 20), np.float32)
    label[np.arange(bs), np.arange(bs) % 20] = 1.0
    cfg = MCLConfig(use_imc=True)
    rng = jax.random.key(0)

    def make_host_batch():
        return {
            "img": rng_np.integers(0, 256, size=(bs, crop, crop, 3)).astype(np.uint8),
            "label": label,
        }

    # --- compile + warmup (2 steps: the first call's output state can carry
    # different shardings than replicate()'s input, retracing on call 2) ----
    with mesh:
        dev_batch = shard_batch(mesh, make_host_batch())
        for _ in range(2):
            state, m = mcl_train_step(model, tx, state, dev_batch, rng, cfg)
            _ = float(m["loss"])

    # --- host_gen ---------------------------------------------------------
    t0 = time.perf_counter()
    for _ in range(args.steps):
        make_host_batch()
    host_gen = (time.perf_counter() - t0) / args.steps

    # --- transfer ----------------------------------------------------------
    hb = make_host_batch()
    with mesh:
        t0 = time.perf_counter()
        for _ in range(args.steps):
            db = shard_batch(mesh, hb)
            jax.block_until_ready(db["img"])
        transfer = (time.perf_counter() - t0) / args.steps

    # --- device-only: chained steps on pre-transferred batches, one fetch.
    # (distinct batches: re-feeding ONE buffer to every queued program
    # serializes through the relay and wildly overstates step time)
    with mesh:
        dev_batches = [shard_batch(mesh, make_host_batch()) for _ in range(args.steps)]
        for db2 in dev_batches:
            jax.block_until_ready(db2["img"])
        t0 = time.perf_counter()
        for db2 in dev_batches:
            state, m = mcl_train_step(model, tx, state, db2, rng, cfg)
        _ = float(m["loss"])  # one sync at the end
        device = (time.perf_counter() - t0) / args.steps

    # --- overlapped: prefetched host batches, no per-step scalar fetch ----
    # (the production train loop's shape: PrefetchLoader covers host_gen,
    # loss fetched every log_every=25 steps; measures whether device_put
    # through the relay blocks dispatch or pipelines with compute)
    host_batches = [make_host_batch() for _ in range(args.steps)]
    with mesh:
        t0 = time.perf_counter()
        for hb2 in host_batches:
            state, m = mcl_train_step(
                model, tx, state, shard_batch(mesh, hb2), rng, cfg
            )
        _ = float(m["loss"])  # one sync at the end
        overlapped = (time.perf_counter() - t0) / args.steps

    # --- sync_loop: the bench.py pattern -----------------------------------
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        with mesh:
            state, m = mcl_train_step(
                model, tx, state, shard_batch(mesh, make_host_batch()), rng, cfg
            )
            _ = float(m["loss"])
        times.append(time.perf_counter() - t0)
    sync_loop = float(np.median(times))

    print(f"host_gen   {host_gen*1e3:8.1f} ms  ({bs*crop*crop*3/1e6:.1f} MB uint8)")
    print(f"transfer   {transfer*1e3:8.1f} ms")
    print(f"device     {device*1e3:8.1f} ms  ({bs/device:.1f} img/s device-only)")
    print(f"overlapped {overlapped*1e3:8.1f} ms  ({bs/overlapped:.1f} img/s production-style)")
    print(f"sync_loop  {sync_loop*1e3:8.1f} ms  ({bs/sync_loop:.1f} img/s bench-style)")


if __name__ == "__main__":
    main()
