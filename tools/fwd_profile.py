"""Device-time breakdown of the MuSCLe CAM forward across TTA canvases.

Times the 'cam'-mode forward (the program CamTTAEngine compiles per
scale) at each TTA canvas size with an on-device lax.fori_loop of reps,
fetching one scalar at the end — the axon relay's ~25 ms result RTT
divides by reps instead of polluting the number (the round-2 stage
benches fell into exactly that trap, see ops/pallas/mbconv.py).

Prints ms/batch, img/s, and the implied MXU utilisation from the conv
FLOP count, per canvas and total.

Usage: OMP_NUM_THREADS=1 python tools/fwd_profile.py [--batch 8]
       [--reps 30] [--dtype bf16] [--backbone efficientnet-b3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="efficientnet-b3")
    ap.add_argument("--batch", default=8, type=int)
    ap.add_argument("--reps", default=30, type=int)
    ap.add_argument("--iters", default=4, type=int)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--base", default=512, type=int,
                    help="scale-1.0 canvas side")
    ap.add_argument("--scales", default="0.5,1.0,1.5,2.0")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from muscle_tpu.models import MuSCLe
    from muscle_tpu.utils.compile_cache import enable

    enable()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    dev = jax.devices()[0]
    print("backend:", dev.platform, dev.device_kind, "| dtype:", args.dtype,
          "| batch:", args.batch)

    model = MuSCLe(backbone_name=args.backbone, mode="enc",
                   last_pooling=False, dtype=dtype)
    v64 = jax.jit(
        lambda key: model.init(key, jnp.zeros((1, 64, 64, 3)), mode="cam")
    )(jax.random.key(0))

    # v5e: 197 bf16 / 98.5 f32 peak TFLOP/s
    peak = 197e12 if args.dtype == "bf16" else 98.5e12

    total_ms = 0.0
    rows = []
    for s in (float(x) for x in args.scales.split(",")):
        side = int(args.base * s)
        side = -(-side // 64) * 64  # engine canvases are 64-aligned
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(args.batch, side, side, 3)),
            jnp.float32)

        @jax.jit
        def run(v, xb, eps, _m=model, _r=args.reps):
            def body(_, acc):
                cam, sgc, emb, logits = _m.apply(v, acc.astype(dtype), mode="cam")
                # fold outputs back to an input-shaped perturbation so the
                # loop carries a data dependence through the whole model
                g = jnp.mean(cam.astype(jnp.float32)) + jnp.mean(logits)
                return xb + (eps + 1e-6 * g)

            out = jax.lax.fori_loop(0, _r, body, xb)
            return jnp.sum(out[0, 0, 0])

        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            float(run(v64, x, np.float32(i * 1e-4)))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts[1:]))
        ms = med * 1000 / args.reps
        total_ms += ms
        # conv FLOPs: measure once via jax cost analysis
        try:
            comp = jax.jit(lambda v, xb: model.apply(
                v, xb.astype(dtype), mode="cam")).lower(v64, x).compile()
            flops = comp.cost_analysis()["flops"]
        except Exception:
            flops = float("nan")
        util = flops / (ms / 1000) / peak * 100
        rows.append((side, ms, util))
        print(f"  canvas {side:4d}^2: {ms:8.2f} ms/batch  "
              f"{args.batch / (ms / 1000):7.1f} img/s  "
              f"{flops/1e9:7.1f} GFLOP  MXU {util:5.1f}%")
    print(f"  total per TTA pass (x2 flips folded in-batch): {total_ms:.2f} ms"
          f" -> {args.batch * len(rows) / (total_ms / 1000):.1f} version/s")


if __name__ == "__main__":
    main()
