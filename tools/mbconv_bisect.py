"""Bisect where time goes inside the fused MBConv Pallas kernel.

Runs a trimmed copy of ops/pallas/mbconv.py's kernel with pieces knocked
out, timing each variant on the real chip, so the cost of a structural
element (depthwise sublane shifts, masks, matmuls, band loop) can be
measured directly — Mosaic kernels are opaque to the profiler.

Variants (cumulative structure, independent knockouts):
  full     — the real kernel structure (expand+mask+dw+SE+project+skip)
  nodw     — depthwise replaced by the center tap (no shifted slices)
  kyonly   — depthwise with only the k row taps (no sublane shifts)
  nomask   — no valid-window masking (no iota, no multiply)
  nose     — SE gate skipped (no scalar matmuls / sum reduction)
  noexpand — expand matmul skipped (e = x broadcast-padded to cmid)
  copyonly — kernel = load x band, store to y (pure DMA/loop skeleton)

Usage: python tools/mbconv_bisect.py [--stage 1] [--variants full,nodw,...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = [  # (tag, side, cin, expand_ratio, kernel)
    ("s1 256^2 c24 e1 k3", 256, 24, 1, 3),
    ("s2 128^2 c32 e6 k3", 128, 32, 6, 3),
    ("s3  64^2 c48 e6 k5", 64, 48, 6, 5),
    ("s4  32^2 c96 e6 k3", 32, 96, 6, 3),
    ("s5  32^2 c136 e6 k5", 32, 136, 6, 5),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=1, type=int)
    ap.add_argument("--batch", default=16, type=int)
    ap.add_argument("--reps", default=20, type=int)
    ap.add_argument("--iters", default=4, type=int)
    ap.add_argument(
        "--variants",
        default="full,nodw,kyonly,nomask,nose,noexpand,copyonly",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from muscle_tpu.ops.pallas.mbconv import _plan, _VMEM_LIMIT
    from muscle_tpu.utils.compile_cache import enable

    enable()
    tag, side, cin, er, k = STAGES[args.stage]
    h = w = side
    cmid = cin * er
    cout = cin
    csq = max(1, cin // 4)
    p = k // 2
    bsz = args.batch
    cdt = jnp.bfloat16
    bh, _ = _plan(h, w, cin, cmid, cout, k, cdt)
    print(f"{tag}: batch {bsz} bh {bh} backend",
          jax.devices()[0].platform, jax.devices()[0].device_kind)

    def make(variant):
        dw = {"full": "all", "nodw": "center", "kyonly": "ky"}.get(variant, "all")
        use_mask = variant != "nomask"
        use_se = variant != "nose"
        use_exp = er != 1 and variant != "noexpand"

        def kernel(win_ref, x_ref, wexp_ref, wdw_ref, wr_ref, we_ref,
                   wpr_ref, y_ref, d_ref):
            b = pl.program_id(0)
            nb = -(-h // bh)
            oy, ox = win_ref[b, 0], win_ref[b, 1]
            wh, ww = win_ref[b, 2], win_ref[b, 3]

            def win_mask(shape, row0, col0):
                rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0
                cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0
                m = ((rows >= oy) & (rows < oy + wh)
                     & (cols >= ox) & (cols < ox + ww))
                return m.astype(jnp.float32)

            if variant == "copyonly":
                def cp(i, c):
                    y0 = jnp.minimum(i * bh, h - bh)
                    y_ref[0, pl.ds(y0, bh)] = (
                        x_ref[0, pl.ds(y0 + p, bh), p:p + w, :]
                    ).astype(y_ref.dtype)
                    return c
                jax.lax.fori_loop(0, nb, cp, jnp.int32(0))
                return

            def band_a(i, ssum):
                y0 = jnp.minimum(i * bh, h - bh)
                xs = x_ref[0, pl.ds(y0, bh + 2 * p), :, :]
                if use_exp:
                    flat = xs.reshape((bh + 2 * p) * (w + 2 * p), xs.shape[-1])
                    e = jnp.dot(flat, wexp_ref[:],
                                preferred_element_type=jnp.float32
                                ).reshape(bh + 2 * p, w + 2 * p, cmid)
                else:
                    e = jnp.broadcast_to(
                        xs.astype(jnp.float32)[..., :1], xs.shape[:2] + (cmid,)
                    ) if cmid != xs.shape[-1] else xs.astype(jnp.float32)
                e = e * jax.nn.sigmoid(e)
                if use_mask:
                    m = win_mask((bh + 2 * p, w + 2 * p), y0 - p, -p)
                    e = e * m[:, :, None]
                e = e.astype(cdt)

                acc = jnp.zeros((bh, w, cmid), jnp.float32)
                if dw == "center":
                    acc = acc + (e[p:p + bh, p:p + w, :]
                                 * wdw_ref[0][None, None, :]).astype(jnp.float32)
                elif dw == "ky":
                    for ky in range(k):
                        acc = acc + (e[ky:ky + bh, p:p + w, :]
                                     * wdw_ref[ky][None, None, :]).astype(jnp.float32)
                else:
                    for ky in range(k):
                        for kx in range(k):
                            acc = acc + (e[ky:ky + bh, kx:kx + w, :]
                                         * wdw_ref[ky * k + kx][None, None, :]
                                         ).astype(jnp.float32)
                d = acc * jax.nn.sigmoid(acc)
                if use_mask:
                    d = d * win_mask((bh, w), y0, 0)[:, :, None]
                d_ref[pl.ds(y0, bh)] = d.astype(d_ref.dtype)
                rows = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0) + y0
                g = (rows >= i * bh).astype(jnp.float32)
                part = jnp.sum((d * g[:, :, None]).reshape(bh * w, cmid),
                               axis=0, keepdims=True)
                return ssum + part

            ssum = jax.lax.fori_loop(
                0, nb, band_a, jnp.zeros((1, cmid), jnp.float32))

            if use_se:
                se_in = jnp.broadcast_to(ssum / (wh * ww).astype(jnp.float32),
                                         (8, cmid))
                sq = jnp.dot(se_in.astype(cdt), wr_ref[:],
                             preferred_element_type=jnp.float32)
                sq = sq * jax.nn.sigmoid(sq)
                se = jax.nn.sigmoid(
                    jnp.dot(sq.astype(cdt), we_ref[:],
                            preferred_element_type=jnp.float32))
            else:
                se = jnp.ones((8, cmid), jnp.float32)

            def band_b(i, carry):
                y0 = jnp.minimum(i * bh, h - bh)
                d = d_ref[pl.ds(y0, bh)].astype(jnp.float32) * se[0][None, None]
                flat = d.astype(cdt).reshape(bh * w, cmid)
                y = jnp.dot(flat, wpr_ref[:],
                            preferred_element_type=jnp.float32
                            ).reshape(bh, w, cout)
                if use_mask:
                    y = y * win_mask((bh, w), y0, 0)[:, :, None]
                y = y + x_ref[0, pl.ds(y0 + p, bh), p:p + w, :].astype(jnp.float32)
                y_ref[0, pl.ds(y0, bh)] = y.astype(y_ref.dtype)
                return carry

            jax.lax.fori_loop(0, nb, band_b, jnp.int32(0))

        rep = lambda *_: tuple(0 for _ in range(2))  # noqa: E731
        rng = np.random.default_rng(0)

        def w_(shape):
            return jnp.asarray(rng.normal(size=shape, scale=0.05), cdt)

        weights = (w_((cin, cmid)), w_((k * k, cmid)), w_((cmid, csq)),
                   w_((csq, cmid)), w_((cmid, cout)))
        win = jnp.tile(jnp.asarray([[0, 0, h, w]], jnp.int32), (bsz, 1))

        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bsz,),
                in_specs=[
                    pl.BlockSpec((1, h + 2 * p, w + 2 * p, cin),
                                 lambda b, *_: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((cin, cmid), lambda b, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k * k, cmid), lambda b, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((cmid, csq), lambda b, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((csq, cmid), lambda b, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((cmid, cout), lambda b, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, h, w, cout),
                                       lambda b, *_: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((h, w, cmid), cdt)],
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, h, w, cout), cdt),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )

        @jax.jit
        def run(x, eps):
            xb = (x + eps).astype(cdt)

            def body(_, acc):
                xp = jnp.pad(acc, ((0, 0), (p, p), (p, p), (0, 0)))
                return call(win, xp, *weights)

            out = jax.lax.fori_loop(0, args.reps, body, xb)
            return jnp.sum(jnp.abs(out.astype(jnp.float32)))

        return run

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(bsz, h, w, cin)), jnp.float32)
    for variant in args.variants.split(","):
        run = make(variant)
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            float(run(x, np.float32(i * 1e-3)))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts[1:]) if len(ts) > 1 else ts[0])
        print(f"  {variant:9s}: {med * 1000 / args.reps:7.3f} ms/block")


if __name__ == "__main__":
    main()
