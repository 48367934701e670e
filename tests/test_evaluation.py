"""mIoU evaluation tests with synthetic prediction/gt folders."""

import os

import numpy as np
import pytest
from PIL import Image

from muscle_tpu.evaluation import (
    confusion_matrix,
    evaluate_folder,
    iou_from_confusion,
    threshold_sweep,
)


def test_confusion_ignores_void():
    gt = np.array([[0, 1], [255, 2]])
    pred = np.array([[0, 1], [1, 1]])
    conf = confusion_matrix(pred, gt, 3)
    assert conf.sum() == 3  # void excluded
    assert conf[0, 0] == 1 and conf[1, 1] == 1 and conf[2, 1] == 1


def test_iou_golden():
    conf = np.array([[50, 10], [5, 35]])
    out = iou_from_confusion(conf)
    np.testing.assert_allclose(out["background"], 100 * 50 / (60 + 55 - 50), rtol=1e-6)
    np.testing.assert_allclose(out["aeroplane"], 100 * 35 / (40 + 45 - 35), rtol=1e-6)


def test_folder_eval_png_and_npy(tmp_path):
    gt_dir = tmp_path / "gt"
    png_dir = tmp_path / "png"
    npy_dir = tmp_path / "npy"
    for d in (gt_dir, png_dir, npy_dir):
        os.makedirs(d)

    rng = np.random.default_rng(0)
    names = [f"im{i}" for i in range(4)]
    for n in names:
        gt = rng.integers(0, 3, (20, 30)).astype(np.uint8)
        Image.fromarray(gt).save(gt_dir / f"{n}.png")
        Image.fromarray(gt).save(png_dir / f"{n}.png")  # perfect prediction
        # npy score dict: high score on the gt class
        scores = {}
        for c in range(1, 3):
            scores[c - 1] = np.where(gt == c, 0.9, 0.05).astype(np.float16)
        np.save(npy_dir / f"{n}.npy", scores)

    perfect = evaluate_folder(str(png_dir), str(gt_dir), names, num_cls=3, input_type="png")
    assert perfect["mIoU"] == pytest.approx(100.0)

    swept = threshold_sweep(str(npy_dir), str(gt_dir), names, [0.2, 0.5, 0.95], num_cls=3)
    # with threshold 0.5 the 0.9-score fg pixels win, 0.05 bg loses -> perfect
    assert swept[1]["mIoU"] == pytest.approx(100.0)
    # threshold 0.95 kills all fg -> everything bg
    assert swept[2]["mIoU"] < 60.0
