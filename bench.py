"""Round benchmark: the five pipeline throughput metrics, ONE JSON line.

Headline (the BASELINE.json north-star): CAM TTA images/sec/chip —
MuSCLe-b3, scales 0.5/1/1.5/2 x flip = 8 versions/image, full on-device
fusion, production fast mode.  `metric`/`value`/`unit`/`vs_baseline` keep
the single-metric driver contract; `extra_metrics` carries the other four
stages (seg TTA img/s, IRN refine ms/image, MCL train imps for step A and
for the full epoch>=12 curriculum iteration), each with its own baseline
anchor and measured spread.

Congestion robustness (round-3 verdict item 2): the device link on this
box is a shared socket relay with heavy run-to-run variance, so
  * each metric runs WINDOWS wall windows INTERLEAVED round-robin across
    metrics (a congested minute hits every metric equally instead of
    sinking whichever one it landed on), value = median;
  * each metric also reports `device_only` — the same device program
    timed over chained executions with all inputs RESIDENT (uploaded and
    synced before the clock), which the relay's upload/download weather
    cannot touch.  wall <= device_only means the stream is link-bound,
    not compute-bound.

Relay-wedge survival (round-4 verdict item 1): invoked plainly
(``python bench.py``) this file is a retry ORCHESTRATOR — each attempt
runs in a fresh ``--worker`` subprocess (the wedge blocks processes, not
the host), bounded by a per-attempt init watchdog and a stall detector,
retried until one lands a full metric line or the total budget
(``MUSCLE_BENCH_TOTAL_BUDGET``, default 3000 s) runs out; final failure
emits the error line PLUS a ``last_known_good`` block with provenance.

Anchors: the reference publishes no numbers (BASELINE.md), and no CUDA
hardware is reachable from this environment, so every `vs_baseline` is
against a DOCUMENTED ESTIMATE of the reference pipeline on one H100
(derivations in BASELINE.md "Working anchors"); each entry names its
anchor.  vs_baseline for throughput metrics = projected v5e-8 slice
(8x per-chip; every stage is embarrassingly data-parallel over images,
weak-scaling evidence: tools/weak_scaling.py + STATUS.md) over the
single-H100 estimate.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

_T0 = time.monotonic()


def _note(msg: str) -> None:
    """Progress to stderr (stdout stays the single driver-parsed JSON line).

    The setup phase compiles five device programs — minutes each on a
    cache-cold host — and a silent stall is indistinguishable from a hang
    without these lines."""
    print(f"[bench +{time.monotonic() - _T0:5.0f}s] {msg}", file=sys.stderr, flush=True)

H100_CAM_IMGS_PER_SEC = 25.0  # estimate, BASELINE.md (batch-1 torch TTA x8)
H100_SEG_IMGS_PER_SEC = 4.0  # estimate, BASELINE.md (12 batch-1 b7 fwds/img)
H100_REFINE_MS_PER_IMG = 1000.0  # estimate, BASELINE.md (dense 15625^2 walk)
H100_MCL_TRAIN_IMPS = 120.0  # estimate, BASELINE.md (b3 448^2 bs16 step)
H100_MCL_CURRICULUM_IMPS = 60.0  # estimate, BASELINE.md (two-step iteration)

BATCH = 8
WINDOWS = 5  # wall windows per metric, interleaved round-robin
DEVICE_WINDOWS = 3  # device-only windows per metric, interleaved
DEVICE_REPS = 3  # chained executions per device-only window


def _fetch_scalar(out) -> None:
    """Synchronise on a device computation by FETCHING one element of it
    (block_until_ready through the axon relay does not reliably wait —
    CLAUDE.md).  Completion of the last program in a chain implies
    completion of the whole chain (in-order device stream)."""
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def _sync_tree(tree) -> None:
    """Force pending async uploads in `tree` to completion before a timed
    region starts: one jitted reduction over the first element of every
    leaf, fetched to host."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(tree)

    @jax.jit
    def probe(xs):
        return sum(x.ravel()[0].astype(jnp.float32) for x in xs)

    float(probe(leaves))


def _device_seconds(exec_once, reps: int = DEVICE_REPS) -> float:
    """Seconds per execution of a resident-input device program: `reps`
    chained dispatches, one tiny fetch at the end (amortises the relay's
    ~25 ms result RTT across the chain)."""
    out = exec_once()  # absorb dispatch setup outside the clock
    _fetch_scalar(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = exec_once()
    _fetch_scalar(out)
    return (time.perf_counter() - t0) / reps


def _stream_rate(run_stream, make_batch, wnd: int, n_batches: int) -> float:
    """Throughput of the engines' threaded prep->dispatch->finalize stream
    (the production CLI pipeline) over one measurement window.  Synthetic-
    image GENERATION is harness cost, not pipeline work, so batches are
    built before the clock starts; canvas packing/upload/compute/download/
    upsample all stay timed (they run inside run_stream)."""
    batches = [make_batch(100 + wnd * 50 + i) for i in range(n_batches)]
    start = time.perf_counter()
    n_imgs = 0
    for out in run_stream(iter(batches)):
        n_imgs += len(out)
    return n_imgs / (time.perf_counter() - start)


class CamBench:
    """Headline: CAM TTA img/s/chip, production fast mode."""

    name = "cam_tta_images_per_sec_per_chip"

    def setup(self) -> None:
        import jax
        import jax.numpy as jnp
        from PIL import Image

        from muscle_tpu.inference import CamTTAEngine
        from muscle_tpu.models import MuSCLe

        rng = np.random.default_rng(0)
        # flagship config: bf16 model compute (f32 params, MXU fast path),
        # stride-16 maps resized straight to original size, f32 fusion
        model = MuSCLe(
            backbone_name="efficientnet-b3", mode="enc", last_pooling=False,
            dtype=jnp.bfloat16,
        )
        variables = jax.jit(
            lambda k: model.init({"params": k}, jnp.zeros((1, 64, 64, 3)), mode="cam")
        )(jax.random.key(0))

        # production fast mode: window-exact padded canvases (placement
        # offsets + per-stage re-zeroing), K-class gather before the resize,
        # stride-4 accumulation grid + host upsample, uint8 quantised
        # download, tight transposed YCbCr 4:2:0 upload
        self.engine = CamTTAEngine(
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

        self.make_batch = make_batch
        for i in range(2):  # compile both canvas orientations
            self.engine.run_batch(*make_batch(i))
        self.rates: list[float] = []
        self.dev_rates: list[float] = []

    def wall_window(self, wnd: int) -> None:
        self.rates.append(
            _stream_rate(self.engine.run_stream, self.make_batch, wnd, 8)
        )

    def device_window(self, wnd: int) -> None:
        exec_once = self.engine.bench_device_exec(*self.make_batch(wnd))
        self.dev_rates.append(BATCH / _device_seconds(exec_once))

    def result(self) -> dict:
        ips = float(np.median(self.rates))
        return {
            "metric": self.name,
            "value": round(ips, 3),
            "unit": "images/s",
            "spread": [round(float(min(self.rates)), 3), round(float(max(self.rates)), 3)],
            "device_only": round(float(np.median(self.dev_rates)), 3),
            "device_only_spread": [
                round(float(min(self.dev_rates)), 3), round(float(max(self.dev_rates)), 3)
            ],
            "vs_baseline": round(ips * 8 / H100_CAM_IMGS_PER_SEC, 3),
            "baseline_anchor": "ESTIMATED 25 img/s for the reference's batch-1 "
            "torch TTA loop on one H100 (derivation: BASELINE.md; no CUDA "
            "hardware reachable to measure it)",
        }


class SegBench:
    name = "seg_tta_images_per_sec_per_chip"
    b = 4

    def setup(self) -> None:
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
        # production output: device-fused upsample+argmax, ONE uint8 label
        # map per image (output='labels') — the r4 probs-mode bench spent
        # ~80% of wall on the 2.8 MB/batch f16 download + 84 host PIL
        # channel upsamples per batch; labels mode downloads 44x less and
        # does no host resample (parity: gate 7 labels_agreement row)
        self.engine = SegTTAEngine(
            model, variables, compute_dtype=jnp.bfloat16, accum_stride=4,
            tight_upload=True, upload_mode="ycbcr420", output="labels",
        )

        def make_batch(i):
            imgs = [
                Image.fromarray(rng.integers(0, 255, (375, 500, 3), np.uint8))
                for _ in range(self.b)
            ]
            return imgs, [f"s{i}_{j}" for j in range(self.b)]

        self.make_batch = make_batch
        self.engine.run_batch(*make_batch(0))  # warmup/compile
        self.rates: list[float] = []
        self.dev_rates: list[float] = []

    def wall_window(self, wnd: int) -> None:
        self.rates.append(
            _stream_rate(self.engine.run_stream, self.make_batch, wnd, 4)
        )

    def device_window(self, wnd: int) -> None:
        exec_once = self.engine.bench_device_exec(*self.make_batch(wnd))
        self.dev_rates.append(self.b / _device_seconds(exec_once))

    def result(self) -> dict:
        ips = float(np.median(self.rates))
        return {
            "metric": self.name,
            "value": round(ips, 3),
            "unit": "images/s",
            "spread": [round(float(min(self.rates)), 3), round(float(max(self.rates)), 3)],
            "device_only": round(float(np.median(self.dev_rates)), 3),
            "device_only_spread": [
                round(float(min(self.dev_rates)), 3), round(float(max(self.dev_rates)), 3)
            ],
            "vs_baseline": round(ips * 8 / H100_SEG_IMGS_PER_SEC, 3),
            "baseline_anchor": "ESTIMATED 4 img/s on one H100 for the "
            "reference's 12 sequential batch-1 b7+BiFPN forwards per image "
            "plus CPU softmax/resize fusion (derivation: BASELINE.md)",
            "notes": "labels output path (device-fused argmax, uint8 "
            "download) — the complete no-CRF pipeline incl. the final "
            "argmax; r4 measured the probs path, which stopped before "
            "argmax and downloaded 44x more",
        }


class RefineBench:
    name = "irn_refine_ms_per_image"
    b = 4

    def setup(self) -> None:
        import jax

        from PIL import Image

        from muscle_tpu.inference import RandomWalkRefiner
        from muscle_tpu.models import EdgeDisplacement

        rng = np.random.default_rng(2)
        model = EdgeDisplacement(crop_size=512)
        variables = jax.jit(
            lambda k: model.init({"params": k}, np.zeros((2, 64, 64, 3), np.float32))
        )(jax.random.key(0))
        # labels output: the reference tail (upsample + /max + bg + argmax,
        # infer_irn.py:79-88) fused on device, one uint8 map down per image
        # (the r4 scores mode downloaded (21, grid, grid) f16 + did 21 host
        # PIL upsamples/image — the wall was ~20x the device-only time)
        self.refiner = RandomWalkRefiner(
            model, variables, crop_size=512, fast_io=True, output="labels"
        )

        def make_batch(i):
            imgs, dicts = [], []
            for j in range(self.b):
                imgs.append(
                    Image.fromarray(rng.integers(0, 255, (375, 500, 3), np.uint8))
                )
                dicts.append(
                    {
                        (i + j) % 20: rng.uniform(0, 1, (375, 500)).astype(np.float16),
                        (i + j + 7) % 20: rng.uniform(0, 1, (375, 500)).astype(np.float16),
                    }
                )
            return imgs, dicts

        self.make_batch = make_batch
        self.refiner.refine_batch(*make_batch(0))  # warmup/compile
        self.times: list[float] = []
        self.dev_times: list[float] = []

    def wall_window(self, wnd: int) -> None:
        t0 = time.perf_counter()
        n = 0
        for i in range(2):
            n += len(self.refiner.refine_batch(*self.make_batch(10 + wnd * 2 + i)))
        self.times.append((time.perf_counter() - t0) * 1000.0 / n)

    def device_window(self, wnd: int) -> None:
        exec_once = self.refiner.bench_device_exec(*self.make_batch(wnd))
        self.dev_times.append(_device_seconds(exec_once) * 1000.0 / self.b)

    def result(self) -> dict:
        ms = float(np.median(self.times))
        return {
            "metric": self.name,
            "value": round(ms, 1),
            "unit": "ms/image",
            "spread": [round(float(min(self.times)), 1), round(float(max(self.times)), 1)],
            "device_only": round(float(np.median(self.dev_times)), 1),
            "device_only_spread": [
                round(float(min(self.dev_times)), 1), round(float(max(self.dev_times)), 1)
            ],
            # lower is better: ratio = (anchor / ours) x 8 chips
            "vs_baseline": round(H100_REFINE_MS_PER_IMG / ms * 8, 3),
            "baseline_anchor": "ESTIMATED 1000 ms/image on one H100 for the "
            "reference's per-image CPU PathIndex + dense (HW)^2 transition "
            "build + 6 matrix squarings (~46 TFLOP at grid 125^2) "
            "(derivation: BASELINE.md)",
            "notes": "labels output path (device-fused upsample/argmax tail, "
            "uint8 download) — the complete refine-to-pseudo-label pipeline; "
            "r4 measured the scores path (f16 grid download + host upsample)",
        }


def _pair_labels(bs: int) -> np.ndarray:
    """Consecutive image pairs carry IDENTICAL two-class sets, pairwise
    disjoint across pairs — IMC needs identical-set positives AND
    disjoint-set negatives to activate."""
    label = np.zeros((bs, 20), np.float32)
    for i in range(bs):
        base = (i // 2) * 4 % 20
        label[i, base] = 1.0
        label[i, base + 1] = 1.0
    return label


class TrainBench:
    """MCL step A (focal/margin/LSEP/ER + IMC): the epochs 4-8 cost."""

    name = "mcl_train_images_per_sec_per_chip"
    bs, crop, win = 16, 448, 8

    def make_cfg(self):
        from muscle_tpu.training import MCLConfig

        return MCLConfig(use_imc=True)

    def setup(self) -> None:
        import jax
        import jax.numpy as jnp

        from muscle_tpu.models import MuSCLe
        from muscle_tpu.parallel import make_data_mesh_for_batch, replicate, shard_batch
        from muscle_tpu.training import MCLConfig, create_train_state, mcl_train_step
        from muscle_tpu.training.state import make_adam

        self.rng_np = np.random.default_rng(3)
        # the reference's pinned config (train_mcl.py:73-86); bf16 is the
        # documented recommended training mode
        self.model = MuSCLe(
            backbone_name="efficientnet-b3", mode="enc", last_pooling=False,
            dtype=jnp.bfloat16,
        )
        variables = jax.jit(
            lambda k: self.model.init(
                {"params": k}, jnp.zeros((1, 64, 64, 3)), mode="cam"
            )
        )(jax.random.key(0))
        self.tx = make_adam(1e-4, 5e-5)
        self.state = create_train_state(variables, self.tx)
        self.mesh = make_data_mesh_for_batch(self.bs)
        self.state = replicate(self.mesh, self.state)
        self.label = _pair_labels(self.bs)
        self.cfg = self.make_cfg()
        self.rng = jax.random.key(0)
        self.step = mcl_train_step
        self.shard_batch = shard_batch
        with self.mesh:
            for _ in range(2):  # compile + warmup (2: output-state shardings)
                self.state, metrics = self.step(
                    self.model, self.tx, self.state,
                    shard_batch(self.mesh, self.make_batch()), self.rng, self.cfg,
                )
                _ = float(metrics["loss"])
        self.rates: list[float] = []
        self.dev_rates: list[float] = []

    def make_batch(self) -> dict:
        # production input mode: YCbCr 4:2:0 planes, decoded + ImageNet-
        # normalised on device (train_mcl --device_norm 1 --upload ycbcr420)
        # — 8x less host->device traffic than the host-normalised f32
        # batch.  Planes are drawn directly (the host pack is untimed
        # PrefetchLoader work either way).
        bs, crop = self.bs, self.crop
        return {
            "img_y": self.rng_np.integers(0, 256, size=(bs, crop, crop)).astype(np.uint8),
            "img_c": self.rng_np.integers(
                0, 256, size=(bs, crop // 2, crop // 2, 2)
            ).astype(np.uint8),
            "label": self.label,
        }

    def _window(self, batches, pre_sharded: bool) -> float:
        """Seconds/step over a window of chained steps with ONE loss fetch
        at the end — the production loop shape (cli/train_mcl.py:
        PrefetchLoader overlaps host prep; losses fetched every
        log_every=25 steps), which also amortises the relay's ~25 ms
        result RTT.  A per-step sync loop understates this same program
        ~2.5x (tools/train_profile.py attribution)."""
        with self.mesh:
            t0 = time.perf_counter()
            for hb in batches:
                dev = hb if pre_sharded else self.shard_batch(self.mesh, hb)
                self.state, metrics = self.step(
                    self.model, self.tx, self.state, dev, self.rng, self.cfg
                )
            _ = float(metrics["loss"])  # one sync per window
            return (time.perf_counter() - t0) / len(batches)

    def wall_window(self, wnd: int) -> None:
        batches = [self.make_batch() for _ in range(self.win)]
        self.rates.append(self.bs / self._window(batches, pre_sharded=False))

    def device_window(self, wnd: int) -> None:
        with self.mesh:
            dev = [
                self.shard_batch(self.mesh, self.make_batch())
                for _ in range(self.win)
            ]
            _sync_tree(dev)  # uploads complete before the clock
        self.dev_rates.append(self.bs / self._window(dev, pre_sharded=True))

    def result(self) -> dict:
        imps = float(np.median(self.rates))
        return {
            "metric": self.name,
            "value": round(imps, 2),
            "unit": "images/s",
            "spread": [round(float(min(self.rates)), 2), round(float(max(self.rates)), 2)],
            "device_only": round(float(np.median(self.dev_rates)), 2),
            "device_only_spread": [
                round(float(min(self.dev_rates)), 2), round(float(max(self.dev_rates)), 2)
            ],
            "vs_baseline": round(imps * 8 / H100_MCL_TRAIN_IMPS, 3),
            "baseline_anchor": "ESTIMATED 120 img/s on one H100 for the "
            "reference's MCL step (b3 448^2 bs16 fwd+bwd, torch/cuDNN) "
            "(derivation: BASELINE.md)",
        }


class CurriculumBench(TrainBench):
    """Full MCL curriculum iteration (epochs >= 12): step A (+IMC) AND
    step B (PixPro + EMD) — TWO optimizer steps per iteration, the
    reference's production cost at train_mcl.py:197-229 (round-3 verdict
    item 3: this phase had no throughput number anywhere)."""

    name = "mcl_train_curriculum_images_per_sec_per_chip"
    win = 6
    view = 224  # VOC12ClsPixDataset view_size default (reference 224^2)

    def make_cfg(self):
        # production epochs>=12 config — step A is jit-compiled under the
        # SAME static cfg the CLI uses in that phase (cli/train_mcl.py:139)
        from muscle_tpu.training import MCLConfig

        return MCLConfig(use_imc=True, use_pixpro=True, use_emd=True)

    def setup(self) -> None:
        from muscle_tpu.training import mcl_views_step

        super().setup()
        self.views_step = mcl_views_step
        with self.mesh:
            for _ in range(2):
                b = self.shard_batch(self.mesh, self.make_batch())
                self.state, m1 = self.step(
                    self.model, self.tx, self.state, b, self.rng, self.cfg
                )
                self.state, m2 = self.views_step(
                    self.model, self.tx, self.state, b, self.rng, self.cfg
                )
                _ = float(m2["loss_pixpro"])
        self.rates, self.dev_rates = [], []

    def make_batch(self) -> dict:
        batch = super().make_batch()
        bs, v = self.bs, self.view
        batch.update(
            # views also ship as YCbCr planes (VOC12ClsPixDataset
            # upload='ycbcr420' converts img AND both views)
            view1_y=self.rng_np.integers(0, 256, (bs, v, v)).astype(np.uint8),
            view1_c=self.rng_np.integers(0, 256, (bs, v // 2, v // 2, 2)).astype(np.uint8),
            view2_y=self.rng_np.integers(0, 256, (bs, v, v)).astype(np.uint8),
            view2_c=self.rng_np.integers(0, 256, (bs, v // 2, v // 2, 2)).astype(np.uint8),
            coord1=np.tile(np.array([[8, 8, 160, 160]], np.int32), (bs, 1)),
            coord2=np.tile(np.array([[24, 16, 160, 160]], np.int32), (bs, 1)),
        )
        return batch

    def _window(self, batches, pre_sharded: bool) -> float:
        with self.mesh:
            t0 = time.perf_counter()
            for hb in batches:
                dev = hb if pre_sharded else self.shard_batch(self.mesh, hb)
                self.state, m1 = self.step(
                    self.model, self.tx, self.state, dev, self.rng, self.cfg
                )
                self.state, m2 = self.views_step(
                    self.model, self.tx, self.state, dev, self.rng, self.cfg
                )
            _ = float(m2["loss_pixpro"])
            return (time.perf_counter() - t0) / len(batches)

    def result(self) -> dict:
        out = super().result()
        out["vs_baseline"] = round(out["value"] * 8 / H100_MCL_CURRICULUM_IMPS, 3)
        out["baseline_anchor"] = (
            "ESTIMATED 60 img/s on one H100 for the reference's epochs>=12 "
            "iteration: step A plus the PixPro+EMD second optimizer step — "
            "two extra 224^2 b3 forwards, one extra backward, and the "
            "Sinkhorn crop scan; the reference's own imps roughly halves "
            "in this phase (derivation: BASELINE.md)"
        )
        return out


def _device_watchdog() -> None:
    """Bound device *initialisation* (not compiles) so a wedged relay
    yields an honest JSON error line instead of an eternal hang.

    The axon chip sits behind a socket relay that has been observed to
    wedge hard: ``jax.devices()`` itself blocks forever, before any
    compile starts (2026-08-20, this host — an 18-minute bench run never
    completed its first RPC and a standalone ``jax.devices()`` probe hung
    >100 s).  jax calls cannot be interrupted from Python, so the probe
    runs in a daemon thread and the main thread waits with a timeout
    (``MUSCLE_BENCH_INIT_TIMEOUT`` seconds — device init is seconds when
    the relay is healthy; compiles happen later and are NOT under this
    clock).  On failure the caller still gets one JSON line on stdout,
    with ``error`` set, and the process exits **rc=2** so the retry
    orchestrator (``main``) can key off the exit code; a probe exception
    (backend absent, connection refused) is reported as itself, not as a
    timeout.
    """
    import os
    import threading

    timeout = float(os.environ.get("MUSCLE_BENCH_INIT_TIMEOUT", "300"))
    ok = threading.Event()
    err: list[BaseException] = []

    def probe() -> None:
        try:
            import jax
            import jax.numpy as jnp

            jax.devices()
            float(jnp.arange(8.0).sum())  # one tiny op end-to-end
            ok.set()
        except BaseException as e:  # report fast failures as themselves
            err.append(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    # poll so an immediate probe exception ends the wait early instead of
    # being misreported as a full-length timeout (ADVICE r4 #2)
    deadline = time.monotonic() + timeout
    while t.is_alive() and not err and time.monotonic() < deadline:
        t.join(min(2.0, max(0.0, deadline - time.monotonic())))
    if not ok.is_set():
        if err:
            msg = f"device init failed: {type(err[0]).__name__}: {err[0]}"
        else:
            msg = (f"device init timed out after {timeout:.0f}s "
                   "(axon relay unreachable)")
        _note(f"{msg} — emitting error line and exiting rc=2")
        print(json.dumps({
            "metric": CamBench.name,
            "error": msg,
            "extra_metrics": [],
        }), flush=True)
        os._exit(2)
    _note("device init ok")


def _run_benches() -> None:
    """One bench attempt in THIS process (worker mode): device watchdog,
    then all five metrics, one JSON line on stdout."""
    from muscle_tpu.utils.compile_cache import enable

    enable()  # XLA compiles take minutes on small hosts; cache persists them
    _device_watchdog()

    benches = [CamBench(), SegBench(), RefineBench(), TrainBench(), CurriculumBench()]
    results: dict[str, dict] = {}
    alive = []
    for b in benches:
        try:
            _note(f"setup {b.name} ...")
            b.setup()
            alive.append(b)
            _note(f"setup {b.name} ok")
        except Exception as e:  # never lose the other metrics
            results[b.name] = {"metric": b.name, "error": f"{type(e).__name__}: {e}"}
            _note(f"setup {b.name} FAILED: {type(e).__name__}: {e}")
    # interleave measurement windows round-robin so link congestion hits
    # every metric equally (value = per-metric median over its windows)
    for phase, n in (("wall_window", WINDOWS), ("device_window", DEVICE_WINDOWS)):
        for wnd in range(n):
            for b in list(alive):
                try:
                    getattr(b, phase)(wnd)
                    _note(f"{phase} {wnd + 1}/{n} {b.name} ok")
                except Exception as e:
                    results[b.name] = {
                        "metric": b.name, "error": f"{type(e).__name__}: {e}"
                    }
                    alive.remove(b)
                    _note(f"{phase} {wnd + 1}/{n} {b.name} FAILED: "
                          f"{type(e).__name__}: {e}")
    for b in alive:
        if b.name not in results:
            try:
                results[b.name] = b.result()
            except Exception as e:
                results[b.name] = {"metric": b.name, "error": f"{type(e).__name__}: {e}"}

    out = results.pop(CamBench.name)
    out["extra_metrics"] = [results[b.name] for b in benches if b.name in results]
    print(json.dumps(out), flush=True)


# Last driver-independent full-run numbers, for the `last_known_good`
# block emitted when every attempt fails (provenance: BASELINE.md
# "Measured on this build box (round 4)" — full bench.py run on the real
# chip, warm cache, after the final round-4 model changes).
LAST_KNOWN_GOOD = {
    "provenance": "BASELINE.md round-4 table (full bench.py run on the real "
                  "chip, 2026-08-20, warm cache; not a driver capture)",
    "metrics": [
        {"metric": "cam_tta_images_per_sec_per_chip", "value": 43.6,
         "device_only": 57.2, "unit": "images/s"},
        {"metric": "seg_tta_images_per_sec_per_chip", "value": 3.76,
         "device_only": 21.4, "unit": "images/s"},
        {"metric": "irn_refine_ms_per_image", "value": 167.0,
         "device_only": 7.5, "unit": "ms/image"},
        {"metric": "mcl_train_images_per_sec_per_chip", "value": 49.5,
         "device_only": 143.1, "unit": "images/s"},
        {"metric": "mcl_train_curriculum_images_per_sec_per_chip",
         "value": 66.5, "device_only": 116.5, "unit": "images/s"},
    ],
}


def main() -> None:
    """Retry orchestrator (round-4 verdict item 1): the relay's observed
    wedge cycle is ~40 min with a ~2 min admission window, and the wedge
    blocks *processes*, not the host — so run each attempt in a FRESH
    subprocess (``python bench.py --worker``) and retry until a worker
    lands a full metric line or the total budget runs out.

    Knobs (env):
      MUSCLE_BENCH_TOTAL_BUDGET  total wall budget, seconds (default 3000)
      MUSCLE_BENCH_INIT_TIMEOUT  per-attempt device-init bound (default 120
                                 under the orchestrator; a worker run
                                 standalone defaults to 300)
      MUSCLE_BENCH_STALL_TIMEOUT kill a worker with no stderr activity for
                                 this long (default 1200 s — cache-cold b7
                                 compiles are minutes on 1 vCPU)

    Exit code is 0 even on final failure — the driver contract is one JSON
    line on stdout; callers retrying at the shell level must key off the
    presence of the ``error`` field, not rc (ADVICE r4 #3).  On final
    failure the line carries ``attempts``, the last per-attempt error, and
    a ``last_known_good`` block with provenance.
    """
    import os
    import subprocess
    import threading

    total = float(os.environ.get("MUSCLE_BENCH_TOTAL_BUDGET", "3000"))
    init_timeout = os.environ.get("MUSCLE_BENCH_INIT_TIMEOUT", "120")
    stall_timeout = float(os.environ.get("MUSCLE_BENCH_STALL_TIMEOUT", "1200"))
    deadline = _T0 + total
    attempt = 0
    last_error = "no attempt ran"

    while time.monotonic() < deadline - 120.0:
        attempt += 1
        remaining = deadline - time.monotonic()
        _note(f"attempt {attempt}: fresh worker (remaining {remaining:.0f}s, "
              f"init timeout {init_timeout}s)")
        env = dict(os.environ, MUSCLE_BENCH_INIT_TIMEOUT=str(init_timeout))
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        out_lines: list[str] = []
        activity = [time.monotonic()]

        def pump(stream, sink, echo):
            for line in stream:
                activity[0] = time.monotonic()
                if sink is not None:
                    sink.append(line)
                if echo:
                    sys.stderr.write(line)
                    sys.stderr.flush()

        ts = [
            threading.Thread(target=pump, args=(proc.stdout, out_lines, False), daemon=True),
            threading.Thread(target=pump, args=(proc.stderr, None, True), daemon=True),
        ]
        for t in ts:
            t.start()
        killed = None
        while proc.poll() is None:
            now = time.monotonic()
            if now > deadline:
                killed = "total budget exhausted mid-attempt"
            elif now - activity[0] > stall_timeout:
                killed = f"no worker activity for {stall_timeout:.0f}s (mid-run wedge)"
            if killed:
                _note(f"attempt {attempt}: {killed} — killing worker")
                proc.kill()
                break
            time.sleep(2.0)
        proc.wait()
        for t in ts:
            t.join(timeout=10.0)

        parsed = None
        for line in reversed(out_lines):
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except ValueError:
                    pass
                break
        if parsed is not None and "value" in parsed:
            parsed["attempts"] = attempt
            print(json.dumps(parsed), flush=True)
            return
        if killed:
            last_error = f"attempt {attempt}: {killed}"
        elif parsed is not None and "error" in parsed:
            last_error = f"attempt {attempt}: {parsed['error']}"
        else:
            last_error = (f"attempt {attempt}: worker exited rc={proc.returncode} "
                          "without a JSON line")
        _note(f"attempt {attempt} failed: {last_error}")

    _note(f"budget exhausted after {attempt} attempt(s) — emitting error line "
          "with last_known_good")
    print(json.dumps({
        "metric": CamBench.name,
        "error": f"all {attempt} attempt(s) failed within "
                 f"{total:.0f}s budget; last: {last_error}",
        "attempts": attempt,
        "retry_contract": "key retries off this `error` field; exit code is "
                          "0 by driver contract",
        "last_known_good": LAST_KNOWN_GOOD,
        "extra_metrics": [],
    }), flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        _run_benches()
    else:
        main()
