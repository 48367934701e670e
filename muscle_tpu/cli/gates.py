"""Fidelity-gate CLI (BASELINE.md configs #1-#5).

Real mode (VOC2012 + published .pth on disk):
    python -m muscle_tpu.cli.gates --voc12_root data/VOC2012 \
        --list data/val.txt --cls_labels data/cls_labels.npy \
        --mcl_weights mcl.pth --irn_weights irn.pth --out_dir out/gates

Synthetic-oracle mode (no assets; the torch reference runs as oracle on
random weights over a generated structured mini-VOC):
    python -m muscle_tpu.cli.gates --synthetic --out_dir out/gates \
        [--backbone efficientnet-b3 --full_size]

Prints one JSON line per gate and writes <out_dir>/gates_report.json.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--voc12_root", default=None, type=str)
    p.add_argument("--list", dest="list_path", default=None, type=str)
    p.add_argument("--cls_labels", default=None, type=str)
    p.add_argument("--mcl_weights", default=None, type=str,
                   help=".pth MCL checkpoint (torch); omit for random-init oracle")
    p.add_argument("--irn_weights", default=None, type=str)
    p.add_argument("--synthetic", action="store_true",
                   help="generate a structured mini-VOC and use the torch "
                        "reference as oracle")
    p.add_argument("--backbone", default="efficientnet-b1", type=str,
                   help="synthetic mode: b1 is tractable on small hosts; use "
                        "efficientnet-b3 --full_size for the realistic bound")
    p.add_argument("--full_size", action="store_true",
                   help="synthetic mode: 375-500px images (else ~1/8 size)")
    p.add_argument("--scales", default="0.5,1.0,1.5,2.0", type=str)
    p.add_argument("--gates", default="1,1f,2,2e,3,4,5,6", type=str,
                   help="subset to run; 1/2 fast paths, 1f=fast single, "
                        "2e=exact list, 6=end-to-end convergence")
    p.add_argument("--out_dir", default="out/gates", type=str)
    p.add_argument("--platform", default=None, type=str,
                   help="re-point jax (e.g. 'cpu') before the backend "
                        "initialises — site hooks may pin a TPU platform")
    args = p.parse_args(argv)

    import numpy as np

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # fidelity gates compare against the f32 torch oracle — the default
    # (bf16-ish) matmul precision would dominate the measured deltas
    jax.config.update("jax_default_matmul_precision", "highest")

    from muscle_tpu import gates as G
    from muscle_tpu.cli.common import fetch_weights
    from muscle_tpu.models import MuSCLe
    from muscle_tpu.utils.compile_cache import enable

    enable()
    if args.mcl_weights:
        args.mcl_weights = fetch_weights(args.mcl_weights)
    if args.irn_weights:
        args.irn_weights = fetch_weights(args.irn_weights)
    os.makedirs(args.out_dir, exist_ok=True)
    scales = tuple(float(s) for s in args.scales.split(","))
    want = set(args.gates.split(","))

    if args.synthetic:
        voc_root = os.path.join(args.out_dir, "synthetic_voc")
        if args.full_size:
            sizes = [(375, 500), (500, 375), (333, 500), (500, 500)]
            out_side, crop = 512, 448
        else:
            sizes = [(48, 64), (64, 48), (42, 64), (64, 64)]
            out_side, crop = 64, 64
        names = G.build_synthetic_voc(voc_root, sizes=sizes)
        labels_path = os.path.join(voc_root, "cls_labels.npy")
    else:
        if not (args.voc12_root and args.list_path and args.cls_labels):
            p.error("--voc12_root/--list/--cls_labels required without --synthetic")
        voc_root = args.voc12_root
        names = [ln.strip() for ln in open(args.list_path) if ln.strip()]
        labels_path = args.cls_labels
        out_side, crop = 512, 448
    labels = np.load(labels_path, allow_pickle=True).item()

    layers = 1
    tmodel, variables = G.make_oracle_muscle(
        args.backbone, mode="enc", layers=layers, weights=args.mcl_weights
    )
    model = MuSCLe(backbone_name=args.backbone, mode="enc", last_pooling=False)

    from PIL import Image

    from muscle_tpu.data.voc12 import get_img_path

    report = []

    def emit(v):
        report.append(v)
        print(json.dumps(v))

    img0 = Image.open(get_img_path(names[0], voc_root)).convert("RGB")
    lab0 = labels[names[0]]
    if "1" in want:
        emit(G.gate1_cam_single(model, variables, tmodel, img0, lab0, scales,
                                out_side, engine_mode="exact"))
    if "1f" in want:
        emit(G.gate1_cam_single(model, variables, tmodel, img0, lab0, scales,
                                out_side, engine_mode="fast"))
    if "2" in want:
        emit(G.gate2_cam_tta_miou(model, variables, tmodel, voc_root, names,
                                  labels, scales, out_side, args.out_dir,
                                  engine_mode="fast"))
    if "2e" in want:
        emit(G.gate2_cam_tta_miou(model, variables, tmodel, voc_root, names,
                                  labels, scales, out_side, args.out_dir,
                                  engine_mode="exact"))
    if "3" in want:
        cam_dir = os.path.join(args.out_dir, "gate2_ours_fast")
        if not os.path.isdir(cam_dir):  # gate 2 produces the CAM npys
            emit(G.gate2_cam_tta_miou(model, variables, tmodel, voc_root, names,
                                      labels, scales, out_side, args.out_dir,
                                      engine_mode="fast"))
        emit(G.gate3_irn_refine(voc_root, names, labels, cam_dir, args.out_dir,
                                weights=args.irn_weights,
                                oracle_method="vector" if args.full_size else "square"))
    if "4" in want:
        emit(G.gate4_train_mcl(voc_root, names, labels_path, args.out_dir,
                               backbone="efficientnet-b1", crop=min(crop, 64)))
    if "5" in want:
        emit(G.gate5_train_muscle(voc_root, names, labels_path, args.out_dir,
                                  crop=min(crop, 64)))
    if "6" in want:
        emit(G.gate6_convergence(voc_root, names, labels_path, args.out_dir,
                                 crop=min(crop, 64)))

    with open(os.path.join(args.out_dir, "gates_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    n_pass = sum(1 for r in report if r["passed"])
    print(json.dumps({"gates_passed": n_pass, "gates_total": len(report)}))


if __name__ == "__main__":
    main()
