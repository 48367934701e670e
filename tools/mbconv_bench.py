"""A/B microbench: EfficientNet backbone forward, XLA lowering vs the
fused Pallas MBConv path (ops/pallas/mbconv.py), on the real chip.

The input batch is uploaded ONCE and perturbed on-device by a scalar, so
the timing isolates device compute from the relay link (which moves
3-12 MB/s and would otherwise dominate).  Times by fetching a scalar
computed inside jit (block_until_ready is unreliable through the axon
relay).  Parity compares per-stage mean-|activation| relative deltas
(raw sums cancel to ~0 and make rel errors meaningless).

Usage: OMP_NUM_THREADS=1 python tools/mbconv_bench.py [--backbone b3]
       [--side 512] [--batch 16] [--fuse 128] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="efficientnet-b3")
    p.add_argument("--side", default=512, type=int)
    p.add_argument("--batch", default=16, type=int)
    p.add_argument("--fuse", default=128, type=int)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--iters", default=10, type=int)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from muscle_tpu.models.efficientnet import EfficientNet
    from muscle_tpu.utils.compile_cache import enable

    enable()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    print("backend:", jax.devices()[0].platform, jax.devices()[0].device_kind)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.batch, args.side, args.side, 3)).astype(np.float32)
    xdev = jax.device_put(x)  # upload once; the loop perturbs on-device

    def build(fuse):
        model = EfficientNet(
            model_name=args.backbone, last_pooling=False, dtype=dtype,
            fuse_max_in_filters=fuse,
        )
        variables = jax.jit(
            lambda k: model.init(k, jnp.zeros((1, 64, 64, 3)))
        )(jax.random.key(0))

        @jax.jit
        def fwd(v, xb, eps):
            feats = model.apply(v, (xb + eps).astype(dtype))
            # scalar fetch forces full materialisation through the relay
            return sum(jnp.sum(jnp.abs(f.astype(jnp.float32))) for f in feats[-3:])

        @jax.jit
        def stage_means(v, xb):
            feats = model.apply(v, xb.astype(dtype))
            return jnp.stack(
                [jnp.mean(jnp.abs(f.astype(jnp.float32))) for f in feats]
            )

        return model, variables, fwd, stage_means

    model0, v0, f0, m0 = build(0)
    modelF, vF, fF, mF = build(args.fuse)

    # parity: per-stage mean-|activation| relative deltas (same variables —
    # the fuse flag is architecture-free)
    a0 = np.asarray(m0(v0, xdev))
    aF = np.asarray(mF(v0, xdev))
    rel = np.abs(a0 - aF) / np.maximum(np.abs(a0), 1e-9)
    print("per-stage mean|act| rel deltas:",
          np.array2string(rel, precision=2, separator=","))
    print(f"parity: max rel {rel.max():.3e}")

    def bench(fwd, v, tag):
        ts = []
        for i in range(args.iters):
            eps = np.float32(i * 1e-3)
            t0 = time.perf_counter()
            float(fwd(v, xdev, eps))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{tag}: median {med*1000:.1f} ms  (min {min(ts)*1000:.1f}, "
              f"max {max(ts)*1000:.1f})")
        return med

    t_plain = bench(f0, v0, "plain-XLA")
    t_fused = bench(fF, v0, f"fused<=({args.fuse})ch")
    print(f"speedup: {t_plain / t_fused:.3f}x")


if __name__ == "__main__":
    main()
