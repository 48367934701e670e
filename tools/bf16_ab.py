"""bf16 training validation: fixed-seed A/B of f32 vs bf16 compute.

Runs the MCL step (A) and the seg step on the SAME synthetic structured
batches with the same seeds under both dtypes and compares loss
trajectories + step times on the real chip.  Writes one JSON line per arm
and a final verdict (documented in BASELINE.md).

Usage:  python tools/bf16_ab.py [--steps 120] [--crop 224] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def synth_batches(n_batches, batch, crop, seed=0):
    """Structured batches: textured background + labelled high-contrast
    blobs (memorisable; losses must actually decrease)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        img = rng.normal(0, 0.4, size=(batch, crop, crop, 3)).astype(np.float32)
        label = np.zeros((batch, 20), np.float32)
        for i in range(batch):
            c = int(rng.integers(0, 20))
            label[i, c] = 1.0
            ch = crop // 3
            r0, c0 = rng.integers(0, crop - ch, 2)
            img[i, r0 : r0 + ch, c0 : c0 + ch] = (c / 10.0) - 1.0 + rng.normal(
                0, 0.05, (ch, ch, 3)
            )
        out.append({"img": img, "label": label})
    return out


def run_arm(dtype_name, steps, batches, crop, batch, seed=0):
    import jax
    import jax.numpy as jnp

    from muscle_tpu.models import MuSCLe
    from muscle_tpu.training import MCLConfig, create_train_state, mcl_train_step
    from muscle_tpu.training.state import make_adam

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = MuSCLe(
        backbone_name="efficientnet-b3", mode="enc", last_pooling=False, dtype=dtype
    )
    rng = jax.random.key(seed)
    variables = model.init({"params": rng}, jnp.zeros((1, crop, crop, 3)), mode="cam")
    tx = make_adam(1e-4, 5e-5)
    state = create_train_state(variables, tx)
    cfg = MCLConfig(use_imc=True)

    losses = []
    times = []
    for it in range(steps):
        b = batches[it % len(batches)]
        rng, r1 = jax.random.split(rng)
        t0 = time.perf_counter()
        state, metrics = mcl_train_step(model, tx, state, b, r1, cfg)
        loss = float(metrics["loss"])  # scalar fetch = sync point
        times.append(time.perf_counter() - t0)
        losses.append(loss)
    return losses, times


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", default=120, type=int)
    p.add_argument("--crop", default=224, type=int)
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--n_batches", default=8, type=int)
    args = p.parse_args(argv)

    from muscle_tpu.utils.compile_cache import enable

    enable()
    batches = synth_batches(args.n_batches, args.batch, args.crop)

    report = {}
    for arm in ("f32", "bf16"):
        losses, times = run_arm(arm, args.steps, batches, args.crop, args.batch)
        k = max(1, args.steps // 5)
        report[arm] = {
            "loss_first": round(float(np.mean(losses[:k])), 4),
            "loss_last": round(float(np.mean(losses[-k:])), 4),
            "losses_tail": [round(float(x), 4) for x in losses[-10:]],
            "step_ms_median": round(1e3 * float(np.median(times[3:])), 1),
        }
        print(json.dumps({arm: report[arm]}))

    f32, bf16 = report["f32"], report["bf16"]
    denom = abs(f32["loss_first"] - f32["loss_last"]) + 1e-9
    rel = abs(bf16["loss_last"] - f32["loss_last"]) / denom
    verdict = {
        "decreased_f32": f32["loss_last"] < f32["loss_first"],
        "decreased_bf16": bf16["loss_last"] < bf16["loss_first"],
        "final_loss_gap_vs_f32_progress": round(float(rel), 4),
        "speedup": round(f32["step_ms_median"] / bf16["step_ms_median"], 3),
        "pass": bool(
            bf16["loss_last"] < bf16["loss_first"] and rel < 0.15
        ),
    }
    print(json.dumps({"verdict": verdict}))


if __name__ == "__main__":
    main()
