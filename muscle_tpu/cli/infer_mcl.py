"""CAM generation CLI (reference infer_mcl.py, flag-compatible).

Writes {class_idx: (H, W) float16} npy dicts for the SGC maps (the
reference saves the SGC fusion, infer_mcl.py:180-182) into <out_npy>_sgc/.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from muscle_tpu.cli.common import add_voc_args, load_lists, load_model_variables
from muscle_tpu.data.voc12 import get_img_path


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--infer_list", default="data/train.txt", type=str)
    p.add_argument("--out_npy", default=None, type=str)
    p.add_argument("--save_cam", default=0, type=int, help="also save raw CAM dicts")
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--scales", default="0.5,1,1.5,2", type=str)
    p.add_argument("--backbone", default="efficientnet-b3", type=str,
                   help="reference uses b3; smaller variants for smoke runs")
    p.add_argument("--exact", default=0, type=int,
                   help="shape-grouped unpadded TTA (bit-parity mode; one "
                        "compile per image shape — use for fidelity gates)")
    p.add_argument("--fast", default=1, type=int,
                   help="1 = production fast mode (K-class gather, stride-4 "
                        "fusion grid + uint8 download, tight ycbcr420 upload, "
                        "2-deep pipeline — DEVIATIONS.md #9/#13); 0 = full-res f16")
    p.add_argument("--spatial", default=0, type=int,
                   help="shard image height over a 'model' mesh axis of this "
                        "size (GSPMD halo convs): latency scaling when the "
                        "batch is smaller than the slice. 0 = pure DP")
    add_voc_args(p)
    args = p.parse_args(argv)

    import jax

    from muscle_tpu.inference import CamTTAEngine
    from muscle_tpu.models import MuSCLe

    model = MuSCLe(
        num_classes=args.num_classes, backbone_name=args.backbone,
        bifpn_layers=3, mode="enc", last_pooling=False,
    )
    variables = load_model_variables(args.weights, model, (1, 64, 64, 3), "cam")
    scales = tuple(float(s) for s in args.scales.split(","))
    fast = dict(accum_stride=4, download_dtype="uint8", tight_upload=True,
                upload_mode="ycbcr420")
    mesh = None
    if args.spatial > 1:
        # batch over 'data' AND image height over 'model' (GSPMD halo
        # convs) — a batch smaller than the slice still uses every chip
        from muscle_tpu.parallel import make_mesh

        mesh = make_mesh(model_axis=args.spatial)
    elif jax.local_device_count() > 1:
        # shard the TTA batch over all local chips (pure DP; see engine doc)
        from muscle_tpu.parallel import make_data_mesh_for_batch

        mesh = make_data_mesh_for_batch(args.batch_size)
    engine = CamTTAEngine(
        model, variables, scales=scales, num_classes=args.num_classes,
        return_cam=bool(args.save_cam), mesh=mesh,
        shard_spatial=args.spatial > 1,
        **(fast if args.fast and not args.exact else {}),
    )

    names, labels = load_lists(args, args.infer_list)
    if args.fast and not args.exact:
        from muscle_tpu.cli.common import sort_by_orientation

        names = sort_by_orientation(names, args.voc12_root)
    if args.out_npy:
        os.makedirs(args.out_npy + "_sgc", exist_ok=True)
        if args.save_cam:
            os.makedirs(args.out_npy, exist_ok=True)

    def save(records):
        for rec in records:
            if args.out_npy:
                np.save(os.path.join(args.out_npy + "_sgc", rec["name"] + ".npy"), rec["sgc"])
                if args.save_cam:
                    np.save(os.path.join(args.out_npy, rec["name"] + ".npy"), rec["cam"])

    from muscle_tpu.cli.common import prefetch_chunks

    def load(chunk):
        return [
            Image.open(get_img_path(n, args.voc12_root)).convert("RGB")
            for n in chunk
        ]

    done = 0
    if args.exact:
        for chunk, imgs in prefetch_chunks(names, args.batch_size, load):
            save(engine.run_batch_exact(imgs, chunk, [labels[n] for n in chunk]))
            done += len(chunk)
            print(f"{done}/{len(names)}")
    else:
        # fully-overlapped stream: decode prefetch feeds the engine's
        # threaded prep -> dispatch -> finalize pipeline (engine.run_stream)
        def batches():
            for chunk, imgs in prefetch_chunks(names, args.batch_size, load):
                yield imgs, chunk, [labels[n] for n in chunk]

        for records in engine.run_stream(batches()):
            save(records)
            done += len(records)
            print(f"{done}/{len(names)}")


if __name__ == "__main__":
    main()
