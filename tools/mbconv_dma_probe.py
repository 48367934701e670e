"""Probe the Mosaic DMA/layout floor behind the fused-MBConv frontier.

tools/mbconv_bisect.py pinned the fused kernel's loss on Mosaic moving
sub-128-channel NHWC at 0.15 TB/s (lane dim = C = 24..48 wastes 75-81%
of each 128-lane row) and the expand matmul at ~9 TFLOP/s (K=C with a
non-sublane-aligned flatten).  ops/pallas/mbconv.py documents the
hypothesised fix: DMA the image as a FLATTENED (H, W*C) 2D view (full
128-lane rows, contiguous HBM extents) and relayout inside VMEM.

MEASURED VERDICT (v5e via axon, 2026-08-18): the frontier is CLOSED, in
both directions.
  (1) The in-kernel relayout does not exist: Mosaic rejects the
      (H, W*C) -> (H*W, C) reshape with "infer-vector-layout:
      unsupported shape cast" (full error captured), so every flat-view
      case below fails to compile.  A flat-DMA fused MBConv would need a
      hand-rolled strided-copy relayout through VMEM scratch, whose VPU
      cost erases the projected win.
  (2) The win itself was overestimated: the roofline it targeted is not
      there.  A plain XLA elementwise stream on this chip saturates at
      ~0.21 TB/s (2/16/128/512 MB: 0.08/0.16/0.21/0.21 TB/s) and a
      4096^3 bf16 matmul at ~92 TFLOP/s — the "0.44 TB/s effective"
      XLA MBConv measurement (stage_bench) therefore already sits ABOVE
      the chip's streaming ceiling (its ~5-crossing traffic model
      overcounts; XLA fuses more than that), i.e. the XLA lowering is
      at or past the hardware's effective memory roofline and the
      "~10x on paper" fused-kernel headroom was an artifact of assuming
      819 GB/s HBM.  Production keeps the XLA path; this tool and
      tools/int8_probe.py are the reproducible evidence.

This tool measures each piece on the real chip:

  copy3d   — (H, W, C) whole-image copy kernel          [prior: 0.15 TB/s]
  copy2d   — (H, W*C) flattened copy kernel             [hypothesis: ~peak]
  relayout — (H, W*C) in, reshape->(H*W, C)->back, out  [relayout cost]
  matmuls  — (H, W*C) in, reshape->(H*W, C), dot (C,6C), dot (6C,C),
             reshape->(H, W*C) out            [expand+project from flat]
  dwroll   — depthwise 3x3 from the flat view via lane rolls by +-C
             and row shifts (no relayout at all)        [VPU from flat view]

Timing: each case is shape-preserving, so ONE jit fetch runs the
pallas_call --loop times chained through a lax.fori_loop carry (defeats
CSE/DCE) with a grid of --reps distinct blocks per call — the axon
relay's ~25 ms result RTT amortises over loop*reps steps (the first
version of this tool fetched per call and measured pure RTT).

Usage: OMP_NUM_THREADS=1 python tools/mbconv_dma_probe.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [  # (tag, H, W, C) — b3 early stages, bf16
    ("s1 256^2 c24", 256, 256, 24),
    ("s2 128^2 c32", 128, 128, 32),
    ("s3  64^2 c48", 64, 64, 48),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", default=16, type=int, help="grid blocks per call")
    p.add_argument("--loop", default=64, type=int, help="chained calls per fetch")
    p.add_argument("--iters", default=4, type=int)
    p.add_argument("--cases", default="copy3d,copy2d,relayout,matmuls,dwroll")
    p.add_argument("--shapes", default="0,1,2")
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from muscle_tpu.utils.compile_cache import enable

    enable()
    dev = jax.devices()[0]
    print("backend:", dev.platform, dev.device_kind)
    dtype = jnp.bfloat16
    R, L = args.reps, args.loop
    steps = R * L

    def bench(call, x, consts, nbytes, flops=0):
        """call(x_like, *consts) -> same shape/dtype as x_like."""

        @jax.jit
        def run(xin, *cs):
            def body(_, c):
                return call(c, *cs)

            out = jax.lax.fori_loop(0, L, body, xin)
            return out.reshape(-1)[:8].astype(jnp.float32).sum()

        try:
            float(run(x, *consts))
        except Exception as e:  # noqa: BLE001
            msg = " ".join(str(e).split())
            print(f"    FAILED: {type(e).__name__}: {msg[:500]}")
            return
        best = np.inf
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(run(x, *consts))
            best = min(best, (time.perf_counter() - t0) / steps)
        tbs = nbytes / best / 1e12
        extra = f"  {flops / best / 1e12:6.1f} TFLOP/s" if flops else ""
        print(f"    {best*1e6:9.2f} us/step   {tbs:6.3f} TB/s{extra}")

    cases = set(args.cases.split(","))

    for si in (int(s) for s in args.shapes.split(",")):
        tag, H, W, C = SHAPES[si]
        E = 6 * C
        rng = np.random.default_rng(0)
        host = (rng.normal(size=(R, H, W, C)) * 0.01).astype(np.float32)
        x3 = jax.device_put(host.astype(dtype))
        x2 = jax.device_put(host.reshape(R, H, W * C).astype(dtype))
        wexp = jax.device_put(
            (rng.normal(size=(C, E)) * 0.05).astype(np.float32).astype(dtype))
        wproj = jax.device_put(
            (rng.normal(size=(E, C)) * 0.05).astype(np.float32).astype(dtype))
        nbytes = 2 * H * W * C * 2  # in + out per step, bf16
        print(f"{tag}  ({H}x{W}x{C} bf16, {H*W*C*2/1e6:.1f} MB/block, "
              f"{steps} steps/fetch)")

        def spec3():
            return pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)

        def spec2(lanes):
            return pl.BlockSpec((1, H, lanes), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        rep2 = lambda i: (0, 0)  # noqa: E731

        if "copy3d" in cases:
            def k3(i_ref, o_ref):
                o_ref[:] = i_ref[:] + jnp.asarray(1e-6, dtype)

            print("  copy3d (H, W, C):")
            bench(
                lambda xx: pl.pallas_call(
                    k3, grid=(R,), in_specs=[spec3()], out_specs=spec3(),
                    out_shape=jax.ShapeDtypeStruct((R, H, W, C), dtype),
                    interpret=args.interpret,
                )(xx),
                x3, (), nbytes,
            )

        if "copy2d" in cases:
            def k2(i_ref, o_ref):
                o_ref[:] = i_ref[:] + jnp.asarray(1e-6, dtype)

            print("  copy2d (H, W*C):")
            bench(
                lambda xx: pl.pallas_call(
                    k2, grid=(R,), in_specs=[spec2(W * C)],
                    out_specs=spec2(W * C),
                    out_shape=jax.ShapeDtypeStruct((R, H, W * C), dtype),
                    interpret=args.interpret,
                )(xx),
                x2, (), nbytes,
            )

        if "relayout" in cases:
            def kr(i_ref, o_ref):
                v = i_ref[0].reshape(H * W, C)
                o_ref[:] = (v + jnp.asarray(1e-6, dtype)).reshape(1, H, W * C)

            print("  relayout roundtrip (H,W*C)->(H*W,C)->(H,W*C):")
            bench(
                lambda xx: pl.pallas_call(
                    kr, grid=(R,), in_specs=[spec2(W * C)],
                    out_specs=spec2(W * C),
                    out_shape=jax.ShapeDtypeStruct((R, H, W * C), dtype),
                    interpret=args.interpret,
                )(xx),
                x2, (), nbytes,
            )

        if "matmuls" in cases:
            def km(i_ref, we_ref, wp_ref, o_ref):
                v = i_ref[0].reshape(H * W, C)
                e = jnp.dot(v, we_ref[:], preferred_element_type=jnp.float32)
                y = jnp.dot(e.astype(dtype), wp_ref[:],
                            preferred_element_type=jnp.float32)
                o_ref[:] = y.astype(dtype).reshape(1, H, W * C)

            print("  matmuls flat->(H*W,C) dot(C,6C) dot(6C,C)->flat:")
            bench(
                lambda xx, we, wp: pl.pallas_call(
                    km, grid=(R,),
                    in_specs=[
                        spec2(W * C),
                        pl.BlockSpec((C, E), rep2, memory_space=pltpu.VMEM),
                        pl.BlockSpec((E, C), rep2, memory_space=pltpu.VMEM),
                    ],
                    out_specs=spec2(W * C),
                    out_shape=jax.ShapeDtypeStruct((R, H, W * C), dtype),
                    interpret=args.interpret,
                )(xx, we, wp),
                x2, (wexp, wproj), nbytes,
                flops=2 * H * W * C * E * 2,
            )

        if "dwroll" in cases:
            dwW = (rng.normal(size=(3, 3)) * 0.2).astype(np.float32)

            def kd(i_ref, o_ref):
                acc = jnp.zeros((H, W * C), jnp.float32)
                v = i_ref[0]
                zrow = jnp.zeros((1, W * C), dtype)
                for dy in (-1, 0, 1):
                    if dy == -1:
                        rows = jnp.concatenate([v[1:], zrow], 0)
                    elif dy == 1:
                        rows = jnp.concatenate([zrow, v[:-1]], 0)
                    else:
                        rows = v
                    for dx in (-1, 0, 1):
                        sh = (pltpu.roll(rows, (-dx * C) % (W * C), 1)
                              if dx else rows)
                        acc = acc + sh.astype(jnp.float32) * float(dwW[dy + 1, dx + 1])
                o_ref[:] = acc.astype(dtype).reshape(1, H, W * C)

            print("  dwroll 3x3 depthwise via lane rolls (flat):")
            bench(
                lambda xx: pl.pallas_call(
                    kd, grid=(R,), in_specs=[spec2(W * C)],
                    out_specs=spec2(W * C),
                    out_shape=jax.ShapeDtypeStruct((R, H, W * C), dtype),
                    interpret=args.interpret,
                )(xx),
                x2, (), nbytes,
            )


if __name__ == "__main__":
    main()
