"""MuSCLe segmentation training CLI (reference train_muscle.py,
flag-compatible): EfficientNet-b7 + BiFPN on soft pseudo-labels with CE +
BEACON field loss, epoch-end val mIoU driving ReduceLROnPlateau.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from muscle_tpu.cli.common import add_voc_args, load_lists, load_model_variables


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", default=6, type=int)
    p.add_argument("--max_epoches", default=8, type=int)
    p.add_argument("--lr", default=1e-5, type=float)
    p.add_argument("--wt_dec", default=1e-5, type=float)
    p.add_argument("--train_list", default="data/train_aug.txt", type=str)
    p.add_argument("--eval_list", default="data/val.txt", type=str)
    p.add_argument("--session_name", default="runs/muscle", type=str)
    p.add_argument("--crop_size", default=448, type=int)
    p.add_argument("--weights", default=None, type=str)
    p.add_argument("--mask_root", type=str, required=True)
    p.add_argument("--k", default=128, type=int)
    p.add_argument("--step", default=7, type=int)
    p.add_argument("--lamb", default=5e-2, type=float)
    p.add_argument("--crf", default=0, type=int)
    p.add_argument("--seed", default=221, type=int)
    p.add_argument("--pretrained", default="b7", type=str)
    p.add_argument("--bifpn", default=3, type=int)
    p.add_argument("--log_dir", default="logs/muscle", type=str)
    p.add_argument("--resume_epoch", default=None, type=int)
    p.add_argument("--bf16", default=0, type=int)
    p.add_argument("--device_norm", default=1, type=int,
                   help="1 = uint8 images + x255-quantised uint8 soft masks, "
                        "decoded/normalised on device (16x less host->device "
                        "traffic; bounded deviations documented on "
                        "VOC12SegDataset); 0 = host f32 (reference-exact)")
    p.add_argument("--pack_mask", default=-1, type=int,
                   help="ship only the mask channels that can be nonzero "
                        "(bg + GT classes) plus a channel-index vector, "
                        "scattered back on device — an EXACT re-encoding "
                        "(walk pseudo-masks zero non-GT classes) that cuts "
                        "the mask's ~87%% share of the batch bytes ~21/K-"
                        "fold. -1 = size K from the label set (default), "
                        "0 = dense 21-channel, K>0 = manual budget "
                        "(raises loudly if exceeded)")
    p.add_argument("--upload", default="ycbcr420", choices=["rgb", "ycbcr420"],
                   help="image upload format under device_norm: 'ycbcr420' "
                        "halves the image bytes — the dominant batch share "
                        "once the mask is packed (bounded chroma-smoothing "
                        "deviation, core/ycbcr.py); 'rgb' is bit-exact. "
                        "Ignored when --device_norm 0")
    p.add_argument("--vis_every", default=25, type=int,
                   help="dump seg-mask PNGs under <log_dir>/vis every N iters; "
                        "0 disables")
    p.add_argument("--log_every", default=25, type=int,
                   help="print + metrics.jsonl cadence in iters; 1 logs every "
                        "step (gate-harness convergence evidence)")
    p.add_argument("--tb", default=1, type=int,
                   help="also write tensorboard event files under "
                        "<log_dir>/tb (reference train_muscle.py tblogger); "
                        "0 disables")
    add_voc_args(p)
    args = p.parse_args(argv)

    import jax

    from muscle_tpu.data import PrefetchLoader, VOC12SegDataset
    from muscle_tpu.models import MuSCLe
    from muscle_tpu.parallel import make_data_mesh_for_batch, replicate, shard_batch
    from muscle_tpu.training import ReduceLROnPlateau, SegConfig, create_train_state, seg_train_step
    from muscle_tpu.training.state import make_adam, save_checkpoint, set_learning_rate
    from muscle_tpu.utils import MetricLogger, Timer

    names, labels = load_lists(args, args.train_list)
    dataset = VOC12SegDataset(
        names, args.voc12_root, labels, args.mask_root,
        min_scale=0.5, max_scale=1.75, crop_size=args.crop_size, mask_type="soft",
        num_classes=args.num_classes, device_norm=bool(args.device_norm),
        pack_mask=args.pack_mask,
        upload=args.upload if args.device_norm else "rgb",
    )
    loader = PrefetchLoader(
        dataset, args.batch_size, seed=args.seed, num_threads=args.num_workers,
        shard=(jax.process_index(), jax.process_count()),
    )

    import jax.numpy as jnp

    model = MuSCLe(
        num_classes=args.num_classes,
        backbone_name="efficientnet-" + args.pretrained,
        bifpn_layers=args.bifpn, mode="dec", last_pooling=True,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    variables = load_model_variables(
        args.weights, model, (1, args.crop_size, args.crop_size, 3), "seg"
    )
    tx = make_adam(args.lr, args.wt_dec)
    state = create_train_state(variables, tx)
    start_epoch = 0
    if args.resume_epoch is not None:
        from muscle_tpu.training import restore_checkpoint

        state = restore_checkpoint(args.session_name, args.resume_epoch, state)
        start_epoch = args.resume_epoch + 1

    mesh = make_data_mesh_for_batch(args.batch_size)
    state = replicate(mesh, state)
    sched = ReduceLROnPlateau(args.lr, factor=0.5, patience=0, min_lr=5e-6)
    cfg = SegConfig(lamb=args.lamb, step=args.step, k=args.k,
                    num_classes=args.num_classes)
    os.makedirs(args.session_name, exist_ok=True)
    mlog = MetricLogger(os.path.join(args.log_dir, "metrics.jsonl"))
    # tensorboard event stream (dependency-free, utils/tb_events.py)
    from muscle_tpu.utils.tb_events import EventWriter

    tb = EventWriter(os.path.join(args.log_dir, "tb")) if args.tb else None
    # seg-mask overlay stream (reference train_muscle.py:206-219 tblogger)
    from muscle_tpu.utils import TrainVisualizer

    vis = TrainVisualizer(
        model, os.path.join(args.log_dir, "vis"), mode="seg", every=args.vis_every,
        tb=tb,
    )
    timer = Timer()
    rng = jax.random.key(args.seed)

    with mesh:
        for ep in range(start_epoch, args.max_epoches):
            for it, batch in enumerate(loader.epoch(ep)):
                rng, r1 = jax.random.split(rng)
                state, metrics = seg_train_step(model, tx, state, shard_batch(mesh, batch), r1, cfg)
                if it % args.log_every == 0:
                    vals = {k: float(v) for k, v in metrics.items()}
                    ips = (it + 1) * args.batch_size / timer.stage_elapsed()
                    print(f"ep {ep} it {it} " + " ".join(f"{k}:{v:.4f}" for k, v in vals.items())
                          + f" imps:{ips:.1f}")
                    mlog.log(int(state.step), **vals, imps=ips, lr=sched.lr)
                    if tb is not None:
                        for k, v in vals.items():
                            tb.add_scalar(f"train/{k}", v, int(state.step))
                vis.maybe_dump(int(state.step), state, batch)

            save_checkpoint(args.session_name, state, ep)
            miou = _val_eval(args, model, state)
            print(f"epoch {ep} val mIoU {miou:.3f}")
            if tb is not None:
                tb.add_scalar("eval/seg_miou", miou, ep)
                tb.flush()
            state = set_learning_rate(state, sched.step(miou))
            timer.reset_stage()
    mlog.close()
    if tb is not None:
        tb.close()


def _val_eval(args, model, state) -> float:
    """Single-scale val mIoU (reference train_muscle.py:224-283); with
    --crf, refines each prediction by one mean-field step before argmax
    (reference train_muscle.py:267-268, ``crf_inference(..., t=1)``)."""
    import os

    from PIL import Image

    from muscle_tpu.data.voc12 import get_img_path
    from muscle_tpu.evaluation import confusion_matrix, iou_from_confusion
    from muscle_tpu.inference import SegTTAEngine

    names, _ = load_lists(args, args.eval_list)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    engine = SegTTAEngine(model, variables, scales=(1.0,), num_classes=args.num_classes)

    conf = np.zeros((args.num_classes, args.num_classes), np.int64)
    bs = 4
    for i in range(0, len(names), bs):
        chunk = names[i : i + bs]
        imgs = [Image.open(get_img_path(n, args.voc12_root)).convert("RGB") for n in chunk]
        for img, rec in zip(imgs, engine.run_batch(imgs, chunk)):
            gt = np.array(
                Image.open(
                    os.path.join(args.voc12_root, "SegmentationClass", rec["name"] + ".png")
                )
            )
            probs = rec["probs"]
            if args.crf:
                from muscle_tpu.ops.crf import mean_field_crf

                probs = np.asarray(
                    mean_field_crf(probs, np.asarray(img, np.float32), t=1)
                )
            pred = np.argmax(probs, axis=-1)
            conf += confusion_matrix(pred, gt, args.num_classes)
    return iou_from_confusion(conf)["mIoU"]


if __name__ == "__main__":
    main()
