"""Round benchmark: the four pipeline throughput metrics, ONE JSON line.

Headline (the BASELINE.json north-star): CAM TTA images/sec/chip —
MuSCLe-b3, scales 0.5/1/1.5/2 x flip = 8 versions/image, full on-device
fusion, production fast mode.  `metric`/`value`/`unit`/`vs_baseline` keep
the single-metric driver contract; `extra_metrics` carries the other three
stages (seg TTA img/s, IRN refine ms/image, MCL train imps), each with its
own baseline anchor and measured spread.

Anchors: the reference publishes no numbers (BASELINE.md), and no CUDA
hardware is reachable from this environment, so every `vs_baseline` is
against a DOCUMENTED ESTIMATE of the reference pipeline on one H100
(derivations in BASELINE.md "Working anchors"); each entry names its
anchor.  vs_baseline for throughput metrics = projected v5e-8 slice
(8x per-chip; every stage is embarrassingly data-parallel over images)
over the single-H100 estimate.
"""

from __future__ import annotations

import collections
import json
import time

import numpy as np

H100_CAM_IMGS_PER_SEC = 25.0  # estimate, BASELINE.md (batch-1 torch TTA x8)
H100_SEG_IMGS_PER_SEC = 4.0  # estimate, BASELINE.md (12 batch-1 b7 fwds/img)
H100_REFINE_MS_PER_IMG = 1000.0  # estimate, BASELINE.md (dense 15625^2 walk)
H100_MCL_TRAIN_IMPS = 120.0  # estimate, BASELINE.md (b3 448^2 bs16 step)

BATCH = 8
WINDOWS = 3  # throughput = median over measurement windows (the device
N_BATCHES = 8  # link on this box has heavy run-to-run variance)
WARMUP_BATCHES = 3


def _pipelined_rate(run_async, make_batch, windows: int, n_batches: int):
    """2-deep async pipeline (profiled best depth on the relay link):
    batch n's download overlaps batch n+1's upload + compute."""
    rates = []
    for wnd in range(windows):
        start = time.perf_counter()
        n_imgs = 0
        pending = collections.deque()
        for i in range(n_batches):
            pending.append(run_async(*make_batch(100 + wnd * 50 + i)))
            if len(pending) > 1:
                n_imgs += len(pending.popleft()())
        while pending:
            n_imgs += len(pending.popleft()())
        rates.append(n_imgs / (time.perf_counter() - start))
    return rates


def _stream_rate(run_stream, make_batch, windows: int, n_batches: int):
    """Throughput of the engines' threaded prep->dispatch->finalize stream
    (the production CLI pipeline).  Synthetic-image GENERATION is harness
    cost, not pipeline work, so batches are built before the clock starts;
    canvas packing/upload/compute/download/upsample all stay timed (they
    run inside run_stream)."""
    rates = []
    for wnd in range(windows):
        batches = [make_batch(100 + wnd * 50 + i) for i in range(n_batches)]
        start = time.perf_counter()
        n_imgs = 0
        for out in run_stream(iter(batches)):
            n_imgs += len(out)
        rates.append(n_imgs / (time.perf_counter() - start))
    return rates


def bench_cam_tta() -> dict:
    import jax.numpy as jnp
    from PIL import Image

    from muscle_tpu.inference import CamTTAEngine
    from muscle_tpu.models import MuSCLe
    import jax

    rng = np.random.default_rng(0)
    # flagship config: bf16 model compute (f32 params, MXU fast path),
    # stride-16 maps resized straight to original size, f32 fusion
    model = MuSCLe(
        backbone_name="efficientnet-b3", mode="enc", last_pooling=False,
        dtype=jnp.bfloat16,
    )
    init = jax.jit(
        lambda k: model.init({"params": k}, jnp.zeros((1, 64, 64, 3)), mode="cam")
    )
    variables = init(jax.random.key(0))

    # production fast mode: window-exact padded canvases (placement offsets
    # + per-stage re-zeroing), K-class gather before the resize, stride-4
    # accumulation grid + host upsample, uint8 quantised download, tight
    # transposed YCbCr 4:2:0 upload (see CamTTAEngine docstring)
    engine = CamTTAEngine(
        model, variables, compute_dtype=jnp.bfloat16, lowres=True,
        device_tta=True, max_classes=4, return_cam=False,
        accum_stride=4, download_dtype="uint8", tight_upload=True,
        upload_mode="ycbcr420",
    )

    # synthetic VOC-shaped inputs (typical 500x375 / 375x500 mix).
    # Orientation is homogeneous WITHIN a batch, alternating across
    # batches — matching the CLIs, which sort the inference list by
    # orientation so the engines' rectangular per-batch canvases skip
    # the square-canvas padding FLOPs.
    def make_batch(i):
        imgs, names, labels = [], [], []
        for j in range(BATCH):
            w, h = (500, 375) if i % 2 == 0 else (375, 500)
            arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            imgs.append(Image.fromarray(arr))
            names.append(f"bench_{i}_{j}")
            lab = np.zeros(20, np.float32)
            lab[(i + j) % 20] = 1.0
            labels.append(lab)
        return imgs, names, labels

    for i in range(WARMUP_BATCHES):  # compile all scale programs
        engine.run_batch(*make_batch(i))
    rates = _stream_rate(engine.run_stream, make_batch, WINDOWS, N_BATCHES)
    ips = float(np.median(rates))
    return {
        "metric": "cam_tta_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "images/s",
        "spread": [round(float(min(rates)), 3), round(float(max(rates)), 3)],
        "vs_baseline": round(ips * 8 / H100_CAM_IMGS_PER_SEC, 3),
        "baseline_anchor": "ESTIMATED 25 img/s for the reference's batch-1 "
        "torch TTA loop on one H100 (derivation: BASELINE.md; no CUDA "
        "hardware reachable to measure it)",
    }


def bench_seg_tta() -> dict:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from muscle_tpu.inference import SegTTAEngine
    from muscle_tpu.models import MuSCLe

    rng = np.random.default_rng(1)
    model = MuSCLe(
        backbone_name="efficientnet-b7", mode="dec", bifpn_layers=3,
        last_pooling=True, dtype=jnp.bfloat16,
    )
    variables = jax.jit(
        lambda k: model.init({"params": k}, jnp.zeros((1, 64, 64, 3)), mode="seg")
    )(jax.random.key(0))
    engine = SegTTAEngine(
        model, variables, compute_dtype=jnp.bfloat16, accum_stride=4,
        download_dtype="float16", tight_upload=True, upload_mode="ycbcr420",
    )
    b = 4

    def make_batch(i):
        imgs = [
            Image.fromarray(rng.integers(0, 255, (375, 500, 3), np.uint8))
            for _ in range(b)
        ]
        return imgs, [f"s{i}_{j}" for j in range(b)]

    engine.run_batch(*make_batch(0))  # warmup/compile
    rates = _stream_rate(engine.run_stream, make_batch, 2, 4)
    ips = float(np.median(rates))
    return {
        "metric": "seg_tta_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "images/s",
        "spread": [round(float(min(rates)), 3), round(float(max(rates)), 3)],
        "vs_baseline": round(ips * 8 / H100_SEG_IMGS_PER_SEC, 3),
        "baseline_anchor": "ESTIMATED 4 img/s on one H100 for the "
        "reference's 12 sequential batch-1 b7+BiFPN forwards per image "
        "plus CPU softmax/resize fusion (derivation: BASELINE.md)",
    }


def bench_refine() -> dict:
    import jax

    from PIL import Image

    from muscle_tpu.inference import RandomWalkRefiner
    from muscle_tpu.models import EdgeDisplacement

    rng = np.random.default_rng(2)
    model = EdgeDisplacement(crop_size=512)
    variables = jax.jit(
        lambda k: model.init({"params": k}, np.zeros((2, 64, 64, 3), np.float32))
    )(jax.random.key(0))
    refiner = RandomWalkRefiner(model, variables, crop_size=512, fast_io=True)
    b = 4

    def make_batch(i):
        imgs, dicts = [], []
        for j in range(b):
            imgs.append(Image.fromarray(rng.integers(0, 255, (375, 500, 3), np.uint8)))
            dicts.append(
                {
                    (i + j) % 20: rng.uniform(0, 1, (375, 500)).astype(np.float16),
                    (i + j + 7) % 20: rng.uniform(0, 1, (375, 500)).astype(np.float16),
                }
            )
        return imgs, dicts

    refiner.refine_batch(*make_batch(0))  # warmup/compile
    times = []
    for wnd in range(2):
        t0 = time.perf_counter()
        n = 0
        for i in range(2):
            n += len(refiner.refine_batch(*make_batch(10 + wnd * 2 + i)))
        times.append((time.perf_counter() - t0) * 1000.0 / n)
    ms = float(np.median(times))
    return {
        "metric": "irn_refine_ms_per_image",
        "value": round(ms, 1),
        "unit": "ms/image",
        "spread": [round(float(min(times)), 1), round(float(max(times)), 1)],
        # lower is better: ratio = (anchor / ours) x 8 chips
        "vs_baseline": round(H100_REFINE_MS_PER_IMG / ms * 8, 3),
        "baseline_anchor": "ESTIMATED 1000 ms/image on one H100 for the "
        "reference's per-image CPU PathIndex + dense (HW)^2 transition "
        "build + 6 matrix squarings (~46 TFLOP at grid 125^2) "
        "(derivation: BASELINE.md)",
    }


def bench_mcl_train() -> dict:
    import jax
    import jax.numpy as jnp

    from muscle_tpu.models import MuSCLe
    from muscle_tpu.parallel import make_data_mesh_for_batch, replicate, shard_batch
    from muscle_tpu.training import MCLConfig, create_train_state, mcl_train_step
    from muscle_tpu.training.state import make_adam

    rng_np = np.random.default_rng(3)
    bs, crop = 16, 448  # the reference's pinned config (train_mcl.py:73-86)
    model = MuSCLe(
        backbone_name="efficientnet-b3", mode="enc", last_pooling=False,
        dtype=jnp.bfloat16,  # documented recommended training mode
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

    def make_batch():
        # production input mode: YCbCr 4:2:0 planes, decoded + ImageNet-
        # normalised on device (train_mcl --device_norm 1 --upload ycbcr420)
        # — 8x less host->device traffic than the host-normalised f32
        # batch.  Planes are drawn directly (the host pack is untimed
        # PrefetchLoader work either way).
        return {
            "img_y": rng_np.integers(0, 256, size=(bs, crop, crop)).astype(np.uint8),
            "img_c": rng_np.integers(
                0, 256, size=(bs, crop // 2, crop // 2, 2)
            ).astype(np.uint8),
            "label": label,
        }

    # Production loop shape (cli/train_mcl.py): PrefetchLoader overlaps host
    # batch prep with device compute, and losses are only fetched every
    # log_every=25 steps — so device_put pipelines with the running step and
    # the per-step scalar sync doesn't exist.  Measure windows of chained
    # steps with ONE loss fetch at the end (also amortises the relay's
    # ~25 ms result RTT); a per-step sync loop understates this same
    # program by ~2.5x (tools/train_profile.py attribution).
    win, n_windows = 8, 3
    with mesh:
        for _ in range(2):  # compile + warmup (2: output-state shardings)
            state, metrics = mcl_train_step(
                model, tx, state, shard_batch(mesh, make_batch()), rng, cfg
            )
            _ = float(metrics["loss"])
        times = []
        for _ in range(n_windows):
            host_batches = [make_batch() for _ in range(win)]
            t0 = time.perf_counter()
            for hb in host_batches:
                state, metrics = mcl_train_step(
                    model, tx, state, shard_batch(mesh, hb), rng, cfg
                )
            _ = float(metrics["loss"])  # one sync per window
            times.append((time.perf_counter() - t0) / win)
    imps = bs / float(np.median(times))
    return {
        "metric": "mcl_train_images_per_sec_per_chip",
        "value": round(imps, 2),
        "unit": "images/s",
        "spread": [
            round(bs / float(max(times)), 2), round(bs / float(min(times)), 2)
        ],
        "vs_baseline": round(imps * 8 / H100_MCL_TRAIN_IMPS, 3),
        "baseline_anchor": "ESTIMATED 120 img/s on one H100 for the "
        "reference's MCL step (b3 448^2 bs16 fwd+bwd, torch/cuDNN) "
        "(derivation: BASELINE.md)",
    }


def main() -> None:
    from muscle_tpu.utils.compile_cache import enable

    enable()  # XLA compiles take minutes on small hosts; cache persists them

    out = bench_cam_tta()
    extra = []
    for fn in (bench_seg_tta, bench_refine, bench_mcl_train):
        try:
            extra.append(fn())
        except Exception as e:  # never lose the headline metric
            extra.append({"metric": fn.__name__, "error": f"{type(e).__name__}: {e}"})
    out["extra_metrics"] = extra
    print(json.dumps(out))


if __name__ == "__main__":
    main()
