"""Attribute the fast-path deviation (gate 1f) to its levers: lowres
chain, accum_stride grid, uint8 quantisation, ycbcr upload.  Oracle =
torch reference fusion chain at full size (gates.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
from muscle_tpu.utils.compile_cache import enable
enable()
from muscle_tpu import gates as G
from muscle_tpu.inference import CamTTAEngine
from muscle_tpu.models import MuSCLe
from PIL import Image

out = "out/attrib"
names = G.build_synthetic_voc(os.path.join(out, "voc"),
                              sizes=[(375, 500), (500, 375)])
labels_path = os.path.join(out, "voc", "cls_labels.npy")
labels = np.load(labels_path, allow_pickle=True).item()
tmodel, variables = G.make_oracle_muscle("efficientnet-b3", "enc", layers=1)
model = MuSCLe(backbone_name="efficientnet-b3", mode="enc", last_pooling=False)
scales = (0.5, 1.0, 1.5, 2.0)

imgs, labs, wants = [], [], []
for n in names:
    img = Image.open(os.path.join(out, "voc", "JPEGImages", n + ".jpg")).convert("RGB")
    lab = labels[n]
    want_cam, want_sgc, _ = G.oracle_cam_fusion(tmodel, img, lab, scales)
    if want_cam:
        imgs.append(img); labs.append(lab); wants.append(want_cam)
print(f"{len(imgs)} conditioned images", flush=True)

VARIANTS = [
    ("lowres only (stride1 f16 rgb)", dict()),
    ("+accum_stride=4", dict(accum_stride=4)),
    ("+uint8", dict(accum_stride=4, download_dtype="uint8")),
    ("+ycbcr+tight (full fast)", dict(accum_stride=4, download_dtype="uint8",
                                      tight_upload=True, upload_mode="ycbcr420")),
    ("stride2 f16 (fidelity+ candidate)", dict(accum_stride=2)),
]
for name, kw in VARIANTS:
    eng = CamTTAEngine(model, variables, scales=scales, out_side=512,
                       lowres=True, device_tta=True, **kw)
    recs = eng.run_batch(imgs, [str(i) for i in range(len(imgs))], labs)
    deltas = []
    for rec, want in zip(recs, wants):
        for k, (w, spread) in want.items():
            deltas.append(float(np.abs(rec["cam"][k].astype(np.float32) - w).mean()))
    print(f"{name:38s} mean|d| = {np.mean(deltas):.4f}", flush=True)
