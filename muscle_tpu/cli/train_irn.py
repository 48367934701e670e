"""IRN training CLI — trains EdgeDisplacement weights from pseudo-labels.

The reference has no IRN training script (its weights are downloaded,
README.md:10); this completes the pipeline so every stage has a first-party
upstream.  Loss definitions follow the reference's
AffinityDisplacementLoss (src/backbones/resnet50_irn.py:143-212).
"""

from __future__ import annotations

import argparse
import os

from muscle_tpu.cli.common import add_voc_args, load_lists


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--max_epoches", default=3, type=int)
    p.add_argument("--lr", default=1e-1, type=float)
    p.add_argument("--wt_dec", default=1e-4, type=float)
    p.add_argument("--train_list", default="data/train_aug.txt", type=str)
    p.add_argument("--pseudo_label_root", required=True, type=str,
                   help="directory of pseudo-label PNGs (e.g. from CAM+CRF)")
    p.add_argument("--session_name", default="runs/irn", type=str)
    p.add_argument("--crop_size", default=512, type=int)
    p.add_argument("--device_norm", default=1, type=int,
                   help="1 = uint8 image + 0/1 uint8 affinity masks decoded "
                        "on device (~16x less host->device traffic); 0 = f32")
    p.add_argument("--upload", default="ycbcr420", choices=["rgb", "ycbcr420"],
                   help="image upload format under device_norm: 'ycbcr420' "
                        "halves the image bytes (bounded chroma-smoothing "
                        "deviation, core/ycbcr.py); 'rgb' is bit-exact. "
                        "Ignored when --device_norm 0")
    p.add_argument("--pack_bits", default=1, type=int,
                   help="ship the 0/1 affinity masks 8 pairs/byte and unpack "
                        "on device — EXACT re-encoding, 8x fewer mask bytes "
                        "(the dominant batch share). Ignored when "
                        "--device_norm 0")
    p.add_argument("--seed", default=0, type=int)
    add_voc_args(p)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from muscle_tpu.data import PrefetchLoader
    from muscle_tpu.data.voc12 import VOC12AffinityDataset
    from muscle_tpu.models import IRNNet
    from muscle_tpu.parallel import make_data_mesh_for_batch, replicate, shard_batch
    from muscle_tpu.training import create_train_state
    from muscle_tpu.training.irn import IRNTrainConfig, irn_train_step
    from muscle_tpu.training.state import save_checkpoint
    from muscle_tpu.utils import Timer

    names, labels = load_lists(args, args.train_list)
    dataset = VOC12AffinityDataset(
        names, args.voc12_root, labels, args.pseudo_label_root,
        crop_size=args.crop_size, device_norm=bool(args.device_norm),
        upload=args.upload if args.device_norm else "rgb",
        pack_bits=bool(args.pack_bits and args.device_norm),
    )
    loader = PrefetchLoader(
        dataset, args.batch_size, seed=args.seed, num_threads=args.num_workers,
        shard=(jax.process_index(), jax.process_count()),
    )

    model = IRNNet()
    variables = model.init(
        {"params": jax.random.key(args.seed)},
        jnp.zeros((1, args.crop_size, args.crop_size, 3)),
    )
    # SGD with momentum + poly decay — the IRN-family recipe; only the two
    # heads train (the ResNet backbone is frozen by stop_gradient).
    steps_total = max(len(names) // args.batch_size, 1) * args.max_epoches
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(args.wt_dec),
            optax.sgd(learning_rate=1.0, momentum=0.9),
        )
    )(learning_rate=optax.polynomial_schedule(args.lr, 0.0, 0.9, steps_total))
    state = create_train_state(variables, tx)

    mesh = make_data_mesh_for_batch(args.batch_size)
    state = replicate(mesh, state)
    cfg = IRNTrainConfig(crop_size=args.crop_size)
    os.makedirs(args.session_name, exist_ok=True)
    timer = Timer()

    with mesh:
        for ep in range(args.max_epoches):
            for it, batch in enumerate(loader.epoch(ep)):
                state, metrics = irn_train_step(model, tx, state, shard_batch(mesh, batch), cfg)
                if it % 25 == 0:
                    vals = {k: float(v) for k, v in metrics.items()}
                    ips = (it + 1) * args.batch_size / timer.stage_elapsed()
                    print(f"ep {ep} it {it} " + " ".join(f"{k}:{v:.4f}" for k, v in vals.items())
                          + f" imps:{ips:.1f}")
            save_checkpoint(args.session_name, state, ep)
            timer.reset_stage()


if __name__ == "__main__":
    main()
