"""Final segmentation inference CLI (reference infer_seg.py,
flag-compatible): 6-scale x flip TTA, optional class gating and dense CRF,
argmax PNG output.
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
    p.add_argument("--infer_list", default="data/val.txt", type=str)
    p.add_argument("--cls_dir", default=None, type=str)
    p.add_argument("--out_seg", default=None, type=str)
    p.add_argument("--crf", default=1, type=int)
    p.add_argument("--crf_backend", default="xla", choices=["xla", "native"], type=str)
    p.add_argument("--bifpn", default=3, type=int)
    p.add_argument("--pretrained", default="b7", type=str)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--fast", default=1, type=int,
                   help="1 = production fast mode (stride-4 prob grid + f16 "
                        "download + tight ycbcr420 upload + 2-deep pipeline, "
                        "DEVIATIONS.md #9/#13); 0 = full-res f32 parity mode")
    p.add_argument("--spatial", default=0, type=int,
                   help="shard image height over a 'model' mesh axis of this "
                        "size (GSPMD halo convs): latency scaling when the "
                        "batch is smaller than the slice. 0 = pure DP")
    add_voc_args(p)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from muscle_tpu.inference import SegTTAEngine
    from muscle_tpu.models import MuSCLe
    from muscle_tpu.ops import mean_field_crf

    model = MuSCLe(
        num_classes=args.num_classes,
        backbone_name="efficientnet-" + args.pretrained,
        bifpn_layers=args.bifpn, mode="dec", last_pooling=True,
    )
    variables = load_model_variables(args.weights, model, (1, 64, 64, 3), "seg")
    fast = dict(accum_stride=4, download_dtype="float16", tight_upload=True,
                upload_mode="ycbcr420")
    mesh = None
    if args.spatial > 1:
        # batch over 'data' AND image height over 'model' (GSPMD halo
        # convs) — a batch smaller than the slice still uses every chip
        from muscle_tpu.parallel import make_mesh

        mesh = make_mesh(model_axis=args.spatial)
    elif jax.local_device_count() > 1:
        from muscle_tpu.parallel import make_data_mesh_for_batch

        mesh = make_data_mesh_for_batch(args.batch_size)
    # no CRF and no class gating -> nothing downstream needs probabilities:
    # fuse the final upsample + argmax on device and download one uint8
    # label map per image (SegTTAEngine output='labels' — ~44x less link
    # traffic and no host per-channel upsample; parity bounded by gate 7's
    # labels_agreement row)
    labels_out = bool(args.fast) and not args.crf and not args.cls_dir
    engine = SegTTAEngine(
        model, variables, num_classes=args.num_classes, mesh=mesh,
        shard_spatial=args.spatial > 1,
        output="labels" if labels_out else "probs",
        **(fast if args.fast else {})
    )

    names, _ = load_lists(args, args.infer_list)
    if args.fast:
        from muscle_tpu.cli.common import sort_by_orientation

        names = sort_by_orientation(names, args.voc12_root)
    if args.out_seg:
        os.makedirs(args.out_seg, exist_ok=True)

    def postprocess(imgs, records):
        for j, rec in enumerate(records):
            if labels_out:
                if args.out_seg:
                    Image.fromarray(rec["label"]).save(
                        os.path.join(args.out_seg, rec["name"] + ".png"))
                continue
            probs = rec["probs"]
            if args.crf:
                orig = np.asarray(imgs[j])
                if args.crf_backend == "native":
                    from muscle_tpu.ops.exact_crf import dense_crf

                    probs = dense_crf(orig, probs.transpose(2, 0, 1), t=4).transpose(1, 2, 0)
                else:
                    probs = np.asarray(
                        mean_field_crf(jnp.asarray(probs), jnp.asarray(orig), t=4)
                    )
            if args.out_seg:
                pred = np.argmax(probs, axis=-1).astype(np.uint8)
                Image.fromarray(pred).save(os.path.join(args.out_seg, rec["name"] + ".png"))

    from muscle_tpu.cli.common import prefetch_chunks

    def load(chunk):
        imgs = [
            Image.open(get_img_path(n, args.voc12_root)).convert("RGB")
            for n in chunk
        ]
        gates = None
        if args.cls_dir:
            gates = [
                np.load(os.path.join(args.cls_dir, n + ".npy"), allow_pickle=True).squeeze()
                for n in chunk
            ]
        return imgs, gates

    done = 0
    if args.fast:
        # fully-overlapped stream: decode prefetch feeds the engine's
        # threaded prep -> dispatch -> finalize pipeline; CRF/PNG happen
        # on the consumer side of the stream
        img_fifo = []

        def batches():
            for chunk, (imgs, gates) in prefetch_chunks(names, args.batch_size, load):
                img_fifo.append(imgs)
                yield imgs, chunk, gates

        for records in engine.run_stream(batches()):
            postprocess(img_fifo.pop(0), records)
            done += len(records)
            print(f"{done}/{len(names)}")
    else:
        for chunk, (imgs, gates) in prefetch_chunks(names, args.batch_size, load):
            postprocess(imgs, engine.run_batch(imgs, chunk, gates))
            done += len(chunk)
            print(f"{done}/{len(names)}")


if __name__ == "__main__":
    main()
