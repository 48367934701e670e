"""Per-stage MBConv microbench: XLA lowering vs the fused Pallas path.

Times ONE stride-1 block per backbone stage shape, repeated R times
on-device inside lax.fori_loop (shape-preserving id-skip blocks), so the
relay link and dispatch overhead amortise away.  Prints per-stage device
ms/block/batch and the implied HBM bandwidth if the block were perfectly
fused (x in + y out only).

Usage: OMP_NUM_THREADS=1 python tools/stage_bench.py [--batch 16]
       [--reps 20] [--dtype bf16] [--stages 0,1,2,3] [--fused]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (tag, side, cin, expand_ratio, kernel, se_ratio) — b3 @ 512^2 input,
# stride-1 blocks per stage (efficientnet.py stage table, width 1.2)
STAGES = [
    ("s1 256^2 c24 e1 k3", 256, 24, 1, 3, 0.25),
    ("s2 128^2 c32 e6 k3", 128, 32, 6, 3, 0.25),
    ("s3  64^2 c48 e6 k5", 64, 48, 6, 5, 0.25),
    ("s4  32^2 c96 e6 k3", 32, 96, 6, 3, 0.25),
    ("s5  32^2 c136 e6 k5", 32, 136, 6, 5, 0.25),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=16, type=int)
    p.add_argument("--reps", default=20, type=int)
    p.add_argument("--iters", default=5, type=int)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--stages", default="0,1,2,3,4", type=str)
    p.add_argument("--fused", action="store_true", help="bench the Pallas path")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from muscle_tpu.models.efficientnet import BlockArgs, MBConvBlock
    from muscle_tpu.utils.compile_cache import enable

    enable()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    print("backend:", jax.devices()[0].platform, jax.devices()[0].device_kind,
          "| mode:", "fused-pallas" if args.fused else "plain-XLA")

    for idx in (int(s) for s in args.stages.split(",")):
        tag, side, cin, er, k, se = STAGES[idx]
        bargs = BlockArgs(
            kernel_size=k, num_repeat=1, input_filters=cin, output_filters=cin,
            expand_ratio=er, id_skip=True, stride=1, se_ratio=se,
        )
        model = MBConvBlock(bargs, dtype=dtype)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(args.batch, side, side, cin)).astype(np.float32)
        variables = jax.jit(
            lambda key: model.init(key, jnp.zeros((1, side, side, cin)))
        )(jax.random.key(0))
        xdev = jax.device_put(x)

        @jax.jit
        def run(v, xb, eps, _m=model, _r=args.reps, _f=args.fused):
            xb = (xb + eps).astype(dtype)

            def body(_, acc):
                return _m.apply(v, acc, fused=_f)

            out = jax.lax.fori_loop(0, _r, body, xb)
            return jnp.sum(jnp.abs(out.astype(jnp.float32)))

        ts = []
        for i in range(args.iters):
            eps = np.float32(i * 1e-3)
            t0 = time.perf_counter()
            float(run(variables, xdev, eps))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts[1:]) if len(ts) > 1 else ts[0])
        ms_block = med * 1000 / args.reps
        xy_bytes = 2 * args.batch * side * side * cin * (2 if args.dtype == "bf16" else 4)
        e_bytes = args.batch * side * side * cin * er * (2 if args.dtype == "bf16" else 4)
        bw = xy_bytes / (ms_block / 1000) / 1e12
        print(f"{tag}: {ms_block:7.3f} ms/block  "
              f"(x+y {xy_bytes/1e6:.1f} MB -> {bw:.2f} TB/s eff; "
              f"e {e_bytes/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
