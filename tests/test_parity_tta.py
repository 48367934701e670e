"""End-to-end TTA-fusion parity: CamTTAEngine (host-prep, full-res path)
vs the reference infer_mcl.py fusion chain run with torch on the SAME
converted weights.

The oracle below reproduces the reference's per-image loop
(infer_mcl.py:107-174) with torch ops: per scaled version forward ->
resize back (bilinear half-pixel == cv2.resize) -> un-flip -> SUM ->
clip -> per-class min-max with the pre-normalisation zeroing.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

import jax
import jax.numpy as jnp

from muscle_tpu.convert import convert_muscle_state_dict
from muscle_tpu.inference import CamTTAEngine
from muscle_tpu.models import MuSCLe
from muscle_tpu.data import transforms as T

from reference_loader import load_reference

src = load_reference()

SCALES = (0.5, 1.0)


def _reference_fusion(tmodel, img: Image.Image, label: np.ndarray):
    """infer_mcl.py:107-174 with torch (F.interpolate standing in for
    cv2.resize — both are bilinear with half-pixel centres)."""
    w, h = img.size
    sgc_versions = []
    score_list = []
    for s in SCALES:
        tw, th = round(w * s), round(h * s)
        arr = T.color_norm(np.asarray(img.resize((tw, th), resample=Image.BICUBIC)))
        for flip in (False, True):
            a = arr[:, ::-1] if flip else arr
            x = torch.from_numpy(a.transpose(2, 0, 1)[None].copy()).float()
            with torch.no_grad():
                _, sgc, _, score = tmodel(x, cam="cam")
                sgc = F.interpolate(sgc, size=(h, w), mode="bilinear", align_corners=False)
            m = sgc[0].numpy()
            if flip:
                m = m[:, :, ::-1]
            sgc_versions.append(m[1:])
            score_list.append(score[:, 1:])

    norm = np.sum(sgc_versions, axis=0)
    norm[norm < 0] = 0
    mx = norm.max(axis=(1, 2), keepdims=True)
    mn = norm.min(axis=(1, 2), keepdims=True)
    norm[norm < mn + 1e-6] = 0
    norm = (norm - mn - 1e-6) / (mx - mn + 1e-6)
    score = torch.sigmoid(torch.mean(torch.cat(score_list, 0), dim=0)).numpy()
    return {k: norm[k] for k in np.nonzero(label > 1e-5)[0]}, score


@pytest.mark.slow
def test_cam_tta_fusion_parity(rng):
    torch.manual_seed(0)
    tmodel = src.MuSCLe(
        num_classes=21, pretrained="efficientnet-b1", layers=1,
        MemoryEfficient=True, last_pooling=False, mode="enc",
    )
    tmodel.eval()
    variables = convert_muscle_state_dict(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    )

    img = Image.fromarray(rng.integers(0, 255, (50, 40, 3), dtype=np.uint8))
    label = np.zeros(20, np.float32)
    label[[3, 7]] = 1

    want_sgc, want_score = _reference_fusion(tmodel, img, label)

    fmodel = MuSCLe(backbone_name="efficientnet-b1", mode="enc", last_pooling=False)
    engine = CamTTAEngine(
        fmodel, variables, scales=SCALES, out_side=64, max_side=50,
        lowres=False, device_tta=False,
    )
    got = engine.run_batch([img], ["x"], [label])[0]

    np.testing.assert_allclose(got["score"], want_score, atol=1e-4)
    assert set(got["sgc"].keys()) == set(int(k) for k in want_sgc.keys())
    for k, want in want_sgc.items():
        have = got["sgc"][int(k)].astype(np.float32)
        np.testing.assert_allclose(have, want, atol=2e-3, err_msg=f"class {k}")

    # the exact shape-grouped mode reproduces the reference chain even
    # more tightly (no canvas padding, f32 maps)
    exact = engine.run_batch_exact([img], ["x"], [label])[0]
    np.testing.assert_allclose(exact["score"], want_score, atol=1e-4)
    for k, want in want_sgc.items():
        have = exact["sgc"][int(k)].astype(np.float32)
        np.testing.assert_allclose(have, want, atol=5e-4, err_msg=f"exact class {k}")
