"""Probe: is an int8 PTQ MBConv materially faster than bf16 on this chip?

The XLA bf16 MBConv lowering is bandwidth-bound at ~0.44 TB/s effective
(tools/stage_bench.py, STATUS.md).  Int8 storage of the expanded tensor
halves every HBM crossing and int8 MXU matmuls run at 2x bf16 peak, so a
quantized inference path could approach 2x/block IF (a) XLA-TPU lowers
int8 convolutions (esp. depthwise) to fast code and (b) the quantize /
dequantize elementwise chains fuse instead of materialising f32 copies.

MEASURED VERDICT (v5e via axon, 2026-08-18, reps 60, batch 16): int8 is
SLOWER than bf16 through XLA-TPU — s2: int8-everywhere 0.65x, int8
matmuls-only 0.91x; s4: int8-everywhere 0.10x (the int8 depthwise conv
lowering is ~10x slower than bf16), matmuls-only 0.89x.  The q/dq
elementwise passes cost more than the int8 MXU rate buys on these
bandwidth-bound blocks, and tools/probe4 shows the chip's streaming
bandwidth ceiling (~0.21 TB/s) applies to int8 tensors the same as bf16
once XLA materialises f32 intermediates around them.  PTQ inference is
therefore NOT a perf lever on this hardware; the production path stays
bf16.  Kept as the reproducible evidence.

This tool measures, per b3 stage shape (same table as stage_bench.py):
  1. bf16 MBConv block chain        (the production path)
  2. int8-everywhere MBConv mock    (1x1 convs as int8 dots, int8 dw conv)
  3. int8-matmul-only mock          (dw stays bf16)

All timing is an on-device lax.fori_loop of --reps with a scalar fetch
(relay-RTT amortised, CLAUDE.md).  Mocks use random weights/scales; this
probes SPEED, not accuracy (accuracy comes later via calibration + gates).

Usage: OMP_NUM_THREADS=1 python tools/int8_probe.py [--reps 60] [--batch 16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = [
    ("s1 256^2 c24 e1 k3", 256, 24, 1, 3),
    ("s2 128^2 c32 e6 k3", 128, 32, 6, 3),
    ("s3  64^2 c48 e6 k5", 64, 48, 6, 5),
    ("s4  32^2 c96 e6 k3", 32, 96, 6, 3),
    ("s5  32^2 c136 e6 k5", 32, 136, 6, 5),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=16, type=int)
    p.add_argument("--reps", default=60, type=int)
    p.add_argument("--iters", default=4, type=int)
    p.add_argument("--stages", default="0,1,2,3,4")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from muscle_tpu.utils.compile_cache import enable

    enable()
    dev = jax.devices()[0]
    print("backend:", dev.platform, dev.device_kind)

    def dw_dimnums():
        return jax.lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
        )

    def block_bf16(x, w, k):
        cdt = jnp.bfloat16
        h = x.shape[1]
        e = jnp.einsum("nhwc,ck->nhwk", x.astype(cdt), w["exp"].astype(cdt))
        e = jax.nn.silu(e * w["s0"].astype(cdt) + w["b0"].astype(cdt))
        d = jax.lax.conv_general_dilated(
            e, w["dw"].astype(cdt), (1, 1), "SAME",
            feature_group_count=e.shape[-1],
            dimension_numbers=dw_dimnums(),
        )
        d = jax.nn.silu(d * w["s1"].astype(cdt) + w["b1"].astype(cdt))
        se = jnp.mean(d, axis=(1, 2), keepdims=True)
        se = jax.nn.sigmoid(
            jnp.einsum("nxyk,kr->nxyr", jax.nn.silu(
                jnp.einsum("nxyk,kr->nxyr", se, w["ser"].astype(cdt))), w["see"].astype(cdt))
        )
        d = d * se
        y = jnp.einsum("nhwk,kc->nhwc", d, w["proj"].astype(cdt))
        y = y * w["s2"].astype(cdt) + w["b2"].astype(cdt)
        return (y + x.astype(cdt)).astype(x.dtype)

    def block_int8(x8, w, k, dw_int8: bool):
        """x8: int8 input with implicit per-tensor scale sx (folded into s0)."""
        f32 = jnp.float32
        e32 = jax.lax.dot_general(
            x8, w["exp8"],
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # nhwc,ck -> nhwk int32
        e = jax.nn.silu(e32.astype(f32) * w["s0"] + w["b0"])
        e8 = jnp.clip(jnp.round(e * w["qe"]), -127, 127).astype(jnp.int8)
        if dw_int8:
            d32 = jax.lax.conv_general_dilated(
                e8, w["dw8"], (1, 1), "SAME",
                feature_group_count=e8.shape[-1],
                dimension_numbers=dw_dimnums(),
                preferred_element_type=jnp.int32,
            )
            d = jax.nn.silu(d32.astype(f32) * w["s1"] + w["b1"])
        else:
            d = jax.lax.conv_general_dilated(
                e8.astype(jnp.bfloat16), w["dw"].astype(jnp.bfloat16),
                (1, 1), "SAME", feature_group_count=e8.shape[-1],
                dimension_numbers=dw_dimnums(),
            )
            d = jax.nn.silu(d.astype(f32) * w["s1"] + w["b1"])
        d8 = jnp.clip(jnp.round(d * w["qd"]), -127, 127).astype(jnp.int8)
        se = jnp.sum(d8.astype(jnp.int32), axis=(1, 2), keepdims=True).astype(f32)
        se = se / (d8.shape[1] * d8.shape[2])
        se = jax.nn.sigmoid(
            jnp.einsum("nxyk,kr->nxyr", jax.nn.silu(
                jnp.einsum("nxyk,kr->nxyr", se, w["ser"])), w["see"])
        )
        g8 = jnp.clip(jnp.round(d8.astype(f32) * se), -127, 127).astype(jnp.int8)
        y32 = jax.lax.dot_general(
            g8, w["proj8"],
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y32.astype(f32) * w["s2"] + w["b2"]
        return jnp.clip(jnp.round(y + x8.astype(f32)), -127, 127).astype(jnp.int8)

    rng = np.random.default_rng(0)

    for idx in (int(s) for s in args.stages.split(",")):
        tag, side, cin, er, k = STAGES[idx]
        ce = cin * er
        sq = max(1, cin // 4)
        w = {
            "exp": rng.normal(size=(cin, ce), scale=0.1).astype(np.float32),
            "dw": rng.normal(size=(k, k, 1, ce), scale=0.1).astype(np.float32),
            "proj": rng.normal(size=(ce, cin), scale=0.1).astype(np.float32),
            "ser": rng.normal(size=(ce, sq), scale=0.1).astype(np.float32),
            "see": rng.normal(size=(sq, ce), scale=0.1).astype(np.float32),
            "s0": np.ones(ce, np.float32) * 1e-2,
            "b0": np.zeros(ce, np.float32),
            "s1": np.ones(ce, np.float32),
            "b1": np.zeros(ce, np.float32),
            "s2": np.ones(cin, np.float32) * 1e-2,
            "b2": np.zeros(cin, np.float32),
            "qe": np.float32(12.0),
            "qd": np.float32(12.0),
        }
        w["exp8"] = np.clip(np.round(w["exp"] * 127), -127, 127).astype(np.int8)
        w["proj8"] = np.clip(np.round(w["proj"] * 127), -127, 127).astype(np.int8)
        w["dw8"] = np.clip(np.round(w["dw"] * 127), -127, 127).astype(np.int8)
        wd = jax.device_put(w)
        x = rng.normal(size=(args.batch, side, side, cin)).astype(np.float32)
        x8 = np.clip(np.round(x * 10), -127, 127).astype(np.int8)
        xb = jax.device_put(x.astype(np.float32))
        x8b = jax.device_put(x8)

        def timed(fn, *inputs, label=""):
            @jax.jit
            def run(w, xin, reps):
                def body(_, acc):
                    return fn(acc, w, k)

                out = jax.lax.fori_loop(0, reps, body, xin)
                return jnp.float32(out.astype(jnp.float32).mean())

            try:
                float(run(wd, *inputs, args.reps))  # compile + warm
            except Exception as e:  # noqa: BLE001
                print(f"  {label:26s} FAILED: {type(e).__name__}: {str(e)[:120]}")
                return None
            best = np.inf
            for _ in range(args.iters):
                t0 = time.perf_counter()
                float(run(wd, *inputs, args.reps))
                best = min(best, (time.perf_counter() - t0) / args.reps)
            return best

        print(f"{tag}  batch {args.batch}")
        t_bf = timed(lambda a, w, k: block_bf16(a.astype(jnp.float32), w, k).astype(jnp.float32), xb, label="bf16")
        t_i8 = timed(functools.partial(block_int8, dw_int8=True), x8b, label="int8 full")
        t_i8m = timed(functools.partial(block_int8, dw_int8=False), x8b, label="int8 matmul-only")
        def fmt(t):
            return f"{t*1e3:8.3f} ms" if t else "   failed"
        print(f"  bf16:            {fmt(t_bf)}")
        if t_i8:
            print(f"  int8 full:       {fmt(t_i8)}   {t_bf/t_i8:5.2f}x vs bf16")
        else:
            print("  int8 full:          failed")
        if t_i8m:
            print(f"  int8 mm-only:    {fmt(t_i8m)}   {t_bf/t_i8m:5.2f}x vs bf16")
        else:
            print("  int8 mm-only:       failed")


if __name__ == "__main__":
    main()
