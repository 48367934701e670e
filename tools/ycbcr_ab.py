"""YCbCr 4:2:0 upload validation: fixed-seed A/B vs uint8 RGB upload.

The train CLIs default to --upload ycbcr420 (half the host->device bytes;
the relay link, not the chip, bounds the step).  That deviates from the
reference's RGB inputs (reference train_mcl.py:162) via chroma smoothing,
so — like the bf16 A/B (tools/bf16_ab.py) — this runs the MCL step on the
SAME synthetic structured uint8 images with the same seeds under both
uploads and compares loss trajectories.  Verdict recorded in BASELINE.md;
per-pixel roundtrip bounds live in
tests/test_datasets_cli.py::test_ycbcr420_training_roundtrip.

Usage:  python tools/ycbcr_ab.py [--steps 120] [--crop 224] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def synth_batches_u8(n_batches, batch, crop, seed=0):
    """uint8 structured batches: textured background + labelled
    high-contrast COLOURED blobs (chroma matters here — a grayscale probe
    would trivially survive chroma subsampling)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        img = rng.integers(80, 176, size=(batch, crop, crop, 3)).astype(np.uint8)
        label = np.zeros((batch, 20), np.float32)
        for i in range(batch):
            c = int(rng.integers(0, 20))
            label[i, c] = 1.0
            ch = crop // 3
            r0, c0 = rng.integers(0, crop - ch, 2)
            # class-coded colour: hue varies with the class so the signal
            # the model must learn lives substantially in the chroma planes
            col = np.array(
                [40 + 10 * (c % 3) * 5, 40 + (c // 3) * 25, 215 - c * 8], np.uint8
            )
            img[i, r0 : r0 + ch, c0 : c0 + ch] = col[None, None]
        out.append({"img": img, "label": label})
    return out


def run_arm(upload, steps, batches_u8, seed=0):
    import jax
    import jax.numpy as jnp

    from muscle_tpu.core.ycbcr import rgb_to_ycbcr420
    from muscle_tpu.models import MuSCLe
    from muscle_tpu.training import MCLConfig, create_train_state, mcl_train_step
    from muscle_tpu.training.state import make_adam

    model = MuSCLe(backbone_name="efficientnet-b3", mode="enc", last_pooling=False)
    rng = jax.random.key(seed)
    crop = batches_u8[0]["img"].shape[1]
    variables = model.init({"params": rng}, jnp.zeros((1, crop, crop, 3)), mode="cam")
    tx = make_adam(1e-4, 5e-5)
    state = create_train_state(variables, tx)
    cfg = MCLConfig(use_imc=True)

    if upload == "ycbcr420":
        batches = []
        for b in batches_u8:
            ys, cs = zip(*(rgb_to_ycbcr420(im) for im in b["img"]))
            batches.append(
                {"img_y": np.stack(ys), "img_c": np.stack(cs), "label": b["label"]}
            )
    else:
        batches = batches_u8  # uint8 RGB, ImageNet-normalised on device

    losses, times = [], []
    for it in range(steps):
        b = batches[it % len(batches)]
        rng, r1 = jax.random.split(rng)
        t0 = time.perf_counter()
        state, metrics = mcl_train_step(model, tx, state, b, r1, cfg)
        losses.append(float(metrics["loss"]))  # scalar fetch = sync point
        times.append(time.perf_counter() - t0)
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
    batches = synth_batches_u8(args.n_batches, args.batch, args.crop)

    report = {}
    for arm in ("rgb", "ycbcr420"):
        losses, times = run_arm(arm, args.steps, batches)
        k = max(1, args.steps // 5)
        report[arm] = {
            "loss_first": round(float(np.mean(losses[:k])), 4),
            "loss_last": round(float(np.mean(losses[-k:])), 4),
            "losses_tail": [round(float(x), 4) for x in losses[-10:]],
            "step_ms_median": round(1e3 * float(np.median(times[3:])), 1),
        }
        print(json.dumps({arm: report[arm]}))

    rgb, ycc = report["rgb"], report["ycbcr420"]
    denom = abs(rgb["loss_first"] - rgb["loss_last"]) + 1e-9
    rel = abs(ycc["loss_last"] - rgb["loss_last"]) / denom
    verdict = {
        "decreased_rgb": rgb["loss_last"] < rgb["loss_first"],
        "decreased_ycbcr420": ycc["loss_last"] < ycc["loss_first"],
        "final_loss_gap_vs_rgb_progress": round(float(rel), 4),
        "pass": bool(ycc["loss_last"] < ycc["loss_first"] and rel < 0.15),
    }
    print(json.dumps({"verdict": verdict}))


if __name__ == "__main__":
    main()
