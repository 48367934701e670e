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
    p.add_argument("--walk_method", default="stencil",
                   choices=["stencil", "vector", "banded", "power"], type=str)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--bf16", default=0, type=int,
                   help="run the edge model in bfloat16 (MXU fast path; the "
                        "walk stays f32) — bounded deviation, see "
                        "tests/test_inference.py")
    p.add_argument("--fast", default=1, type=int,
                   help="1 = production IO mode (ycbcr420 image upload, "
                        "K-channel f16 CAM upload, grid-res f16 download + "
                        "host upsample — ~16x less link traffic, "
                        "DEVIATIONS.md #14); 0 = full-res f32 parity IO")
    add_voc_args(p)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from muscle_tpu.cli.common import fetch_weights
    from muscle_tpu.convert import convert_irn_state_dict, load_torch_checkpoint
    from muscle_tpu.inference import RandomWalkRefiner
    from muscle_tpu.models import EdgeDisplacement

    model = EdgeDisplacement()
    weights = fetch_weights(args.irn_weights_name)
    if weights.endswith(".msgpack"):
        # a muscle_tpu train_irn checkpoint instead of a published .pth
        from muscle_tpu.training.state import load_model_msgpack

        init = model.init(
            {"params": jax.random.key(0)}, jnp.zeros((2, 64, 64, 3), jnp.float32)
        )
        variables = load_model_msgpack(weights, init)
    else:
        sd = load_torch_checkpoint(weights)
        variables = convert_irn_state_dict(sd)

    refiner = RandomWalkRefiner(
        model, variables, beta=args.beta, exp_times=args.exp_times,
        bg_threshold=args.sem_seg_bg_thres, walk_method=args.walk_method,
        fast_io=bool(args.fast),
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        # PNG-only output needs no soft scores: fuse the reference tail
        # (upsample + /max + bg + argmax, infer_irn.py:79-88) on device and
        # download one uint8 map per image (DEVIATIONS.md #16)
        output="scores" if (args.soft_output or not args.fast) else "labels",
    )

    names, _ = load_lists(args, args.infer_list)
    if args.soft_output:
        os.makedirs(args.sem_seg_out_dir, exist_ok=True)
    os.makedirs(args.sem_seg_out_dir + "_png", exist_ok=True)

    from muscle_tpu.cli.common import prefetch_chunks

    def load(chunk):
        imgs, dicts = [], []
        for name in chunk:
            imgs.append(Image.open(get_img_path(name, args.voc12_root)).convert("RGB"))
            dicts.append(
                np.load(
                    os.path.join(args.cam_dir, name + ".npy"), allow_pickle=True
                ).item()
            )
        return imgs, dicts

    done = 0
    for chunk, (imgs, dicts) in prefetch_chunks(
        names, max(1, args.batch_size), load
    ):
        for name, scores in zip(chunk, refiner.refine_batch(imgs, dicts)):
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
        done += len(chunk)
        print(f"{done}/{len(names)}")


if __name__ == "__main__":
    main()
