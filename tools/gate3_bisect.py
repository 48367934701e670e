"""Bisect the gate-3 trained-walk mIoU delta (VERDICT r4 item 5).

GATES_r04's `3_irn_refine_miou_trained` row showed mIoU delta 0.127 at
pixel agreement 0.96 — the largest delta in the report — without an
attribution to any one component.  This tool decomposes the ours-vs-
oracle chain (reference infer_irn.py:62-95) into swappable stages and
measures each arm's label agreement + mIoU delta against the full torch
oracle on the SAME trained CAMs the gate uses:

  arm              edge fwd   cam downsample   walk
  oracle           torch      torch            reference matrix-squaring
  walk_stencil     torch      torch            ours stencil      <- walk only
  walk_vector      torch      torch            ours vector       <- walk parity mode
  edge_ours        ours       torch            reference         <- edge fwd only
  down_ours        torch      ours             reference         <- downsample only
  full             ours       ours             ours stencil      <- recomposed
  refiner          ----- RandomWalkRefiner.refine_image -----    <- gate 3's literal path
                                                                    (incl. crop-canvas prep + tail)

All arms share the reference's tail (x4 bilinear upsample, /max, bg pad
0.35, argmax — infer_irn.py:79-88) executed in torch, so any arm's delta
is attributable to exactly the component(s) it swaps.

Usage (after a gate run that produced trained CAMs + the synthetic voc):
    OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 python tools/gate3_bisect.py \
        --out_dir out/gates_quick   # expects gate2_ours_fast_trained/ + synthetic_voc/

Prints one JSON line per arm and a summary table; writes
<out_dir>/gate3_bisect.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="out/gates_quick")
    p.add_argument("--cam_dir", default=None,
                   help="default <out_dir>/gate2_ours_fast_trained")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from muscle_tpu.utils.compile_cache import enable, serialize_cpu_codegen

    serialize_cpu_codegen()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    enable()

    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F
    from PIL import Image

    from muscle_tpu import gates as G
    from muscle_tpu.convert import convert_irn_state_dict
    from muscle_tpu.data import transforms as T
    from muscle_tpu.data.voc12 import get_img_path
    from muscle_tpu.evaluation import confusion_matrix, iou_from_confusion
    from muscle_tpu.inference import RandomWalkRefiner
    from muscle_tpu.models import EdgeDisplacement
    from muscle_tpu.ops.random_walk import propagate_to_edge

    voc_root = os.path.join(args.out_dir, "synthetic_voc")
    cam_dir = args.cam_dir or os.path.join(args.out_dir, "gate2_ours_fast_trained")
    names = [
        f[:-4] for f in sorted(os.listdir(cam_dir)) if f.endswith(".npy")
    ]
    if not names:
        raise SystemExit(f"no CAM npys in {cam_dir} — run the gates first")

    src = G._load_reference()
    import src.backbones.resnet50 as ref_r50
    import src.backbones.resnet50_irn as ref_irn
    from src import indexing as ref_indexing

    orig = ref_r50.resnet50
    ref_r50.resnet50 = lambda pretrained=True, **kw: orig(pretrained=False, **kw)
    try:
        torch.manual_seed(args.seed)
        tnet = ref_irn.EdgeDisplacement(crop_size=512)
    finally:
        ref_r50.resnet50 = orig
    tnet.eval()
    variables = convert_irn_state_dict(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    )
    jmodel = EdgeDisplacement(crop_size=512)
    # bucket=0 = gate 3's reference-faithful config (the torch edge net is
    # canvas-size sensitive; see gates.gate3_irn_refine)
    refiner = RandomWalkRefiner(jmodel, variables, crop_size=512, bucket=0)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self

    @jax.jit
    def jax_edge(variables, x):
        edge, _ = jmodel.apply(variables, x)
        return edge

    arms = ["oracle", "walk_stencil", "walk_vector", "edge_ours", "down_ours",
            "full", "refiner"]
    conf = {a: np.zeros((21, 21), np.int64) for a in arms}
    agree = {a: [] for a in arms}
    edge_deltas, down_deltas = [], []

    def tail_to_labels(rw, h, w):
        """Shared reference tail: x4 upsample, /max, bg 0.35, argmax."""
        rw_up = F.interpolate(rw, scale_factor=4, mode="bilinear",
                              align_corners=False)[..., 0, :h, :w]
        rw_up = rw_up / torch.max(rw_up)
        rw_bg = F.pad(rw_up, (0, 0, 0, 0, 1, 0), value=0.35)
        return torch.argmax(rw_bg, dim=0).numpy().astype(np.uint8)

    for n in names:
        img = Image.open(get_img_path(n, voc_root)).convert("RGB")
        cam = np.load(os.path.join(cam_dir, n + ".npy"), allow_pickle=True).item()
        arr = T.color_norm(np.asarray(img))
        h, w = arr.shape[:2]
        x = np.stack([arr, arr[:, ::-1]], 0).transpose(0, 3, 1, 2)

        with torch.no_grad():
            edge_t, _ = tnet(torch.from_numpy(np.ascontiguousarray(x)).float())
        # ours: NHWC forward on the same normalised pair.  Our model fuses
        # the flip pair internally and returns (fh, fw); torch returns
        # (1, fh, fw) — unsqueeze for the reference walk's broadcasting.
        edge_j_hw = np.asarray(jax_edge(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1))
        ))
        edge_j = torch.from_numpy(edge_j_hw).unsqueeze(0)
        edge_deltas.append(float((edge_j - edge_t).abs().max()))

        cam_arr = np.zeros((20, h, w), np.float32)
        for k, v in cam.items():
            cam_arr[k] = v
        cams = torch.from_numpy(cam_arr)
        down_t = F.interpolate(cams.unsqueeze(0), size=edge_t.shape[1:],
                               mode="bilinear", align_corners=False)
        # ours: the refiner's downsample is the same half-pixel bilinear as
        # a composed interp matmul (core/resize) — measure it directly
        from muscle_tpu.core.resize import _interp_matrix

        mh = _interp_matrix(h, edge_t.shape[1], align_corners=False)
        mw = _interp_matrix(w, edge_t.shape[2], align_corners=False)
        down_j = torch.from_numpy(np.ascontiguousarray(
            np.einsum("Hh,chw,Ww->cHW", mh, cam_arr, mw, optimize=True)
        )).unsqueeze(0)
        down_deltas.append(float((down_j - down_t).abs().max()))

        def ref_walk(down, edge):
            with torch.no_grad():
                return ref_indexing.propagate_to_edge(
                    down.contiguous(), edge.contiguous(), beta=8,
                    exp_times=6, radius=5)

        def our_walk(down, edge, method):
            # both sides carry the fused sigmoid edge: torch (1, fh, fw),
            # ours (fh, fw) — [0] drops the broadcast dim
            out = propagate_to_edge(
                jnp.asarray(down.numpy()[0]), jnp.asarray(edge.numpy()[0]),
                radius=5, beta=8, exp_times=6, method=method,
            )
            # reference walk returns (C, 1, grid, grid) — match it so the
            # shared tail's [..., 0, :h, :w] slices the same axis
            return torch.from_numpy(np.asarray(out)).unsqueeze(1)

        rw = {
            "oracle": ref_walk(down_t, edge_t),
            "walk_stencil": our_walk(down_t, edge_t, "stencil"),
            "walk_vector": our_walk(down_t, edge_t, "vector"),
            "edge_ours": ref_walk(down_t, edge_j),
            "down_ours": ref_walk(down_j, edge_t),
            "full": our_walk(down_j, edge_j, "stencil"),
        }
        gt = np.array(Image.open(
            os.path.join(voc_root, "SegmentationClass", n + ".png")))
        labs = {a: tail_to_labels(r, h, w) for a, r in rw.items()}
        # gate 3's literal ours path (refiner canvas prep + device tail)
        labs["refiner"] = refiner.to_png_labels(refiner.refine_image(img, cam))
        for a in arms:
            conf[a] += confusion_matrix(labs[a], gt, 21)
            agree[a].append(float((labs[a] == labs["oracle"]).mean()))

    torch.Tensor.cuda = orig_cuda

    miou = {a: iou_from_confusion(conf[a])["mIoU"] for a in arms}
    rows = []
    for a in arms:
        rows.append({
            "arm": a,
            "mIoU": round(float(miou[a]), 4),
            "mIoU_delta_vs_oracle": round(float(abs(miou[a] - miou["oracle"])), 4),
            "agreement_vs_oracle": round(float(np.mean(agree[a])), 4),
        })
        print(json.dumps(rows[-1]), flush=True)
    summary = {
        "edge_fwd_max_abs_delta": round(float(np.max(edge_deltas)), 6),
        "cam_downsample_max_abs_delta": round(float(np.max(down_deltas)), 6),
        "n_images": len(names),
    }
    print(json.dumps(summary), flush=True)
    with open(os.path.join(args.out_dir, "gate3_bisect.json"), "w") as f:
        json.dump({"arms": rows, "summary": summary}, f, indent=2)


if __name__ == "__main__":
    main()
