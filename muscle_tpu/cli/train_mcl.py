"""MCL contrastive classifier training CLI (reference train_mcl.py,
flag-compatible), running on a data-parallel device mesh.

Curriculum (reference train_mcl.py:152-229): epochs 0-3 classification
losses only; +IMC from epoch 4; +PixPro second step from epoch 8; +EMD
from epoch 12.  Epoch-end: checkpoint, rapid CAM eval over bg thresholds
0.20-0.50, ReduceLROnPlateau on the best mIoU.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from muscle_tpu.cli.common import add_voc_args, load_lists, load_model_variables


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--max_epoches", default=16, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--wt_dec", default=5e-5, type=float)
    p.add_argument("--train_list", default="data/train_aug.txt", type=str)
    p.add_argument("--eval_list", default="data/train.txt", type=str)
    p.add_argument("--session_name", default="runs/EffSeg_mcl", type=str)
    p.add_argument("--crop_size", default=448, type=int)
    p.add_argument("--weights", default=None, type=str)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--log_dir", default="logs/mcl", type=str)
    p.add_argument("--resume_epoch", default=None, type=int,
                   help="resume full train state (params+optimizer) from "
                        "<session_name>/step_<epoch> — unlike the reference, "
                        "optimizer state survives restarts")
    p.add_argument("--backbone", default="efficientnet-b3", type=str)
    p.add_argument("--device_norm", default=1, type=int,
                   help="1 = ship uint8 batches and ImageNet-normalise on "
                        "device (4x less host->device traffic; pad/erase "
                        "fill deviates <= 0.009, see VOC12ClsPixDataset); "
                        "0 = host-normalised f32 (reference-exact)")
    p.add_argument("--upload", default="ycbcr420", choices=["rgb", "ycbcr420"],
                   help="batch upload format under device_norm: 'ycbcr420' "
                        "ships full-res luma + 2x2-subsampled chroma planes "
                        "(half the bytes over the host->device link, which "
                        "bounds the step; bounded chroma-smoothing deviation, "
                        "core/ycbcr.py); 'rgb' ships uint8 RGB (bit-exact "
                        "colors). Ignored when --device_norm 0")
    p.add_argument("--bf16", default=0, type=int,
                   help="bf16 model compute (f32 params/optimizer) — the "
                        "TPU mixed-precision fast path; ~2x step time")
    p.add_argument("--vis_every", default=25, type=int,
                   help="dump CAM/SGC overlay PNGs under <log_dir>/vis every N "
                        "iters (reference tblogger stream); 0 disables")
    p.add_argument("--log_every", default=25, type=int,
                   help="print + metrics.jsonl cadence in iters (reference "
                        "train_mcl.py:234 prints every 25); 1 logs every step "
                        "(the gate harness's convergence evidence needs "
                        "per-step losses)")
    p.add_argument("--tb", default=1, type=int,
                   help="also write tensorboard event files under "
                        "<log_dir>/tb (reference train_mcl.py:102 "
                        "SummaryWriter); 0 disables")
    p.add_argument("--profile_dir", default=None, type=str,
                   help="capture a jax.profiler trace of steps 10-13 of "
                        "epoch 0 (the reference installs torch-tb-profiler "
                        "but never wires it in, SURVEY §5)")
    add_voc_args(p)
    args = p.parse_args(argv)

    import jax

    from muscle_tpu.data import PrefetchLoader, VOC12ClsPixDataset
    from muscle_tpu.models import MuSCLe
    from muscle_tpu.parallel import make_data_mesh_for_batch, replicate, shard_batch
    from muscle_tpu.training import (
        MCLConfig,
        ReduceLROnPlateau,
        create_train_state,
        mcl_train_step,
        mcl_views_step,
    )
    from muscle_tpu.training.state import make_adam, save_checkpoint, set_learning_rate
    from muscle_tpu.utils import MetricLogger, Timer, TrainVisualizer
    from muscle_tpu.utils.tb_events import EventWriter

    names, labels = load_lists(args, args.train_list)
    dataset = VOC12ClsPixDataset(
        names, args.voc12_root, labels, crop_size=args.crop_size,
        device_norm=bool(args.device_norm),
        upload=args.upload if args.device_norm else "rgb",
    )
    loader = PrefetchLoader(
        dataset,
        args.batch_size,
        seed=args.seed,
        num_threads=args.num_workers,
        shard=(jax.process_index(), jax.process_count()),
    )

    import jax.numpy as jnp

    model = MuSCLe(
        num_classes=args.num_classes, backbone_name=args.backbone,
        bifpn_layers=3, mode="enc", last_pooling=False,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    variables = load_model_variables(
        args.weights, model, (1, args.crop_size, args.crop_size, 3), "cam"
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
    sched = ReduceLROnPlateau(args.lr, factor=0.5, patience=0, min_lr=1e-5)
    os.makedirs(args.session_name, exist_ok=True)
    mlog = MetricLogger(os.path.join(args.log_dir, "metrics.jsonl"))
    # tensorboard event stream (the reference's tensorboardX SummaryWriter,
    # train_mcl.py:102; dependency-free writer, utils/tb_events.py)
    tb = EventWriter(os.path.join(args.log_dir, "tb")) if args.tb else None
    # CAM/SGC overlay stream (reference train_mcl.py:255-277 tblogger)
    vis = TrainVisualizer(
        model, os.path.join(args.log_dir, "vis"), mode="cam", every=args.vis_every,
        tb=tb,
    )
    timer = Timer()
    rng = jax.random.key(args.seed)

    with mesh:
        for ep in range(start_epoch, args.max_epoches):
            cfg = MCLConfig(use_imc=ep >= 4, use_pixpro=ep >= 8, use_emd=ep >= 12)
            for it, batch in enumerate(loader.epoch(ep)):
                if args.profile_dir and ep == 0 and it == 10:
                    jax.profiler.start_trace(args.profile_dir)
                if args.profile_dir and ep == 0 and it == 14:
                    jax.profiler.stop_trace()
                rng, r1, r2 = jax.random.split(rng, 3)
                dev = shard_batch(mesh, batch)
                state, metrics = mcl_train_step(model, tx, state, dev, r1, cfg)
                if cfg.use_pixpro:
                    state, m2 = mcl_views_step(model, tx, state, dev, r2, cfg)
                    metrics.update(m2)
                if it % args.log_every == 0:
                    vals = {k: float(v) for k, v in metrics.items()}
                    ips = (it + 1) * args.batch_size / timer.stage_elapsed()
                    print(f"ep {ep} it {it} " + " ".join(f"{k}:{v:.4f}" for k, v in vals.items())
                          + f" imps:{ips:.1f} lr:{sched.lr:.7f}")
                    mlog.log(int(state.step), **vals, imps=ips, lr=sched.lr)
                    if tb is not None:
                        for k, v in vals.items():
                            tb.add_scalar(f"train/{k}", v, int(state.step))
                        tb.add_scalar("train/lr", sched.lr, int(state.step))
                vis.maybe_dump(int(state.step), state, batch)

            save_checkpoint(args.session_name, state, ep)
            miou = _rapid_eval(args, model, state)
            print(f"epoch {ep} best train-CAM mIoU {miou:.3f}")
            if tb is not None:
                tb.add_scalar("eval/cam_miou", miou, ep)
                tb.flush()
            new_lr = sched.step(miou)
            state = set_learning_rate(state, new_lr)
            timer.reset_stage()
    mlog.close()
    if tb is not None:
        tb.close()


def _rapid_eval(args, model, state) -> float:
    """Epoch-end CAM eval (reference train_mcl.py:286-318): single-scale
    maxnormed SGC maps over the eval list, best mIoU across bg thresholds
    0.20..0.50 step 0.02."""
    import jax

    from muscle_tpu.evaluation import threshold_sweep
    from muscle_tpu.inference import CamTTAEngine
    from muscle_tpu.data.voc12 import get_img_path
    from PIL import Image

    names, labels = load_lists(args, args.eval_list)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    engine = CamTTAEngine(model, variables, scales=(1.0,), num_classes=args.num_classes)

    outdir = os.path.join(args.session_name, "training_eval")
    os.makedirs(outdir, exist_ok=True)
    bs = 8
    for i in range(0, len(names), bs):
        chunk = names[i : i + bs]
        imgs = [Image.open(get_img_path(n, args.voc12_root)).convert("RGB") for n in chunk]
        labs = [labels[n] for n in chunk]
        for rec in engine.run_batch(imgs, chunk, labs):
            np.save(os.path.join(outdir, rec["name"] + ".npy"), rec["sgc"])

    gt = os.path.join(args.voc12_root, "SegmentationClass")
    results = threshold_sweep(outdir, gt, names, np.arange(0.20, 0.52, 0.02))
    return max(r["mIoU"] for r in results)


if __name__ == "__main__":
    main()
