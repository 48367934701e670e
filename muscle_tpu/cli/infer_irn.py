"""Random-walk CAM refinement CLI (reference infer_irn.py, flag-compatible).

Outputs hard pseudo-labels as palettised PNGs or soft float16 (H, W, 21)
npy labels for BEACON training.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from muscle_tpu.cli.common import add_voc_args, load_lists
from muscle_tpu.core.palette import save_indexed_png
from muscle_tpu.data.voc12 import get_img_path


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--beta", default=8, type=int)
    p.add_argument("--exp_times", default=6, type=int)
    p.add_argument("--sem_seg_bg_thres", default=0.35, type=float)
    p.add_argument("--irn_weights_name", type=str, required=True)
    p.add_argument("--cam_dir", required=True, type=str)
    p.add_argument("--sem_seg_out_dir", default="./irn_rw", type=str)
    p.add_argument("--infer_list", default="data/train.txt", type=str)
    p.add_argument("--soft_output", default=0, type=int)
    p.add_argument("--walk_method", default="banded",
                   choices=["vector", "banded", "power"], type=str)
    add_voc_args(p)
    args = p.parse_args(argv)

    import jax

    from muscle_tpu.convert import convert_irn_state_dict, load_torch_checkpoint
    from muscle_tpu.inference import RandomWalkRefiner
    from muscle_tpu.models import EdgeDisplacement

    model = EdgeDisplacement()
    sd = load_torch_checkpoint(args.irn_weights_name)
    variables = convert_irn_state_dict(sd)

    refiner = RandomWalkRefiner(
        model, variables, beta=args.beta, exp_times=args.exp_times,
        bg_threshold=args.sem_seg_bg_thres, walk_method=args.walk_method,
    )

    names, _ = load_lists(args, args.infer_list)
    if args.soft_output:
        os.makedirs(args.sem_seg_out_dir, exist_ok=True)
    os.makedirs(args.sem_seg_out_dir + "_png", exist_ok=True)

    for i, name in enumerate(names):
        img = Image.open(get_img_path(name, args.voc12_root)).convert("RGB")
        cam_dict = np.load(os.path.join(args.cam_dir, name + ".npy"), allow_pickle=True).item()
        scores = refiner.refine_image(img, cam_dict)  # (H, W, 21)
        if args.soft_output:
            np.save(
                os.path.join(args.sem_seg_out_dir, name + ".npy"),
                scores.astype(np.float16),
            )
        else:
            save_indexed_png(
                os.path.join(args.sem_seg_out_dir + "_png", name + ".png"),
                refiner.to_png_labels(scores),
            )
        if i % 50 == 0:
            print(f"{i}/{len(names)}")


if __name__ == "__main__":
    main()
