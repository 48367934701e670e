"""Five-stage pipeline integration test on a synthetic miniature VOC.

Exercises the full artifact chain with tiny b1 models and random weights:
  1. CAM TTA generation -> {cls: score} npy dicts
  2. IRN random-walk refinement -> soft (H, W, 21) pseudo-labels
  3. Segmentation training on the pseudo-labels (one step)
  4. Seg TTA inference -> probabilities
  5. CRF + argmax -> PNG labels -> mIoU evaluation
matching the reference's file-based stage contract (SURVEY §0).
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from muscle_tpu.core.palette import save_indexed_png
from muscle_tpu.evaluation import evaluate_folder
from muscle_tpu.inference import CamTTAEngine, RandomWalkRefiner, SegTTAEngine
from muscle_tpu.models import EdgeDisplacement, MuSCLe
from muscle_tpu.ops.exact_crf import dense_crf
from muscle_tpu.training import SegConfig, create_train_state, seg_train_step
from muscle_tpu.training.state import make_adam


@pytest.mark.slow
def test_five_stage_pipeline(tmp_path):
    rng = np.random.default_rng(0)
    names = ["im0", "im1"]
    sizes = [(48, 40), (40, 44)]
    imgs = {
        n: Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        for n, (h, w) in zip(names, sizes)
    }
    labels = {n: np.zeros(20, np.float32) for n in names}
    labels["im0"][2] = 1
    labels["im1"][5] = 1

    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    for n, (h, w) in zip(names, sizes):
        gt = np.zeros((h, w), np.uint8)
        gt[h // 4 : h // 2, w // 4 : w // 2] = np.argmax(labels[n]) + 1
        Image.fromarray(gt).save(gt_dir / f"{n}.png")

    # --- stage 1: CAM generation ---
    enc = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    enc_vars = enc.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)), mode="cam")
    cam_engine = CamTTAEngine(
        enc, enc_vars, scales=(0.5, 1.0), out_side=64, max_side=50
    )
    cam_dir = tmp_path / "cams"
    os.makedirs(cam_dir)
    recs = cam_engine.run_batch([imgs[n] for n in names], names, [labels[n] for n in names])
    for rec in recs:
        np.save(cam_dir / f"{rec['name']}.npy", rec["sgc"])

    # --- stage 2: random-walk refinement -> soft pseudo-labels ---
    irn = EdgeDisplacement(crop_size=64)
    irn_vars = irn.init({"params": jax.random.key(1)}, jnp.zeros((2, 64, 64, 3)))
    refiner = RandomWalkRefiner(irn, irn_vars, crop_size=64)
    mask_dir = tmp_path / "masks"
    os.makedirs(mask_dir)
    for n in names:
        cam_dict = np.load(cam_dir / f"{n}.npy", allow_pickle=True).item()
        scores = refiner.refine_image(imgs[n], cam_dict)
        assert scores.shape == (*imgs[n].size[::-1], 21)
        np.save(mask_dir / f"{n}.npy", scores.astype(np.float16))

    # --- stage 3: one seg training step on the pseudo-labels ---
    dec = MuSCLe(backbone_name="efficientnet-b1", mode="dec", bifpn_layers=1, last_pooling=True)
    dec_vars = dec.init({"params": jax.random.key(2)}, jnp.zeros((1, 32, 32, 3)), mode="seg")
    tx = make_adam(1e-5, 1e-5)
    state = create_train_state(dec_vars, tx)
    crop = 32
    batch_imgs, batch_masks, batch_labels = [], [], []
    for n in names:
        arr = np.asarray(imgs[n].resize((crop, crop)), np.float32) / 255.0
        mask = np.load(mask_dir / f"{n}.npy").astype(np.float32)
        m = np.stack(
            [np.asarray(Image.fromarray(mask[..., c]).resize((crop, crop))) for c in range(21)],
            axis=-1,
        )
        batch_imgs.append(arr)
        batch_masks.append(m)
        batch_labels.append(labels[n])
    batch = {
        "img": np.stack(batch_imgs),
        "mask": np.stack(batch_masks),
        "label": np.stack(batch_labels),
    }
    state, metrics = seg_train_step(
        dec, tx, state, batch, jax.random.key(3), SegConfig(lamb=5e-2, step=3, k=8)
    )
    assert np.isfinite(float(metrics["loss"]))

    # --- stages 4+5: seg TTA -> CRF -> argmax PNG -> eval ---
    seg_engine = SegTTAEngine(
        dec, {"params": state.params, "batch_stats": state.batch_stats},
        scales=(1.0,), out_side=64, max_side=50,
    )
    pred_dir = tmp_path / "preds"
    os.makedirs(pred_dir)
    for rec in seg_engine.run_batch([imgs[n] for n in names], names):
        probs = rec["probs"]
        refined = dense_crf(
            np.asarray(imgs[rec["name"]]), probs.transpose(2, 0, 1), t=2
        ).transpose(1, 2, 0)
        save_indexed_png(str(pred_dir / f"{rec['name']}.png"), refined.argmax(-1))

    result = evaluate_folder(str(pred_dir), str(gt_dir), names, num_cls=21, input_type="png")
    assert 0.0 <= result["mIoU"] <= 100.0
