"""Gate-4 honesty canary (VERDICT r4 item 3): a deliberately-broken MCL
training run (lr=0 — the optimizer applies nothing, so the loss cannot
decrease) must FAIL the quick-tier memorisation gate, and the healthy
quick config (60 steps @ lr 1e-3, min_decrease 0.10) must PASS.

The r4 quick tier waived the decrease criterion (`quick or decreased`),
so this exact broken run passed; the gate now asserts the decrease in
every tier.  Run:

    OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 python tools/gate4_lr0_canary.py \
        [--out_dir /tmp/gate4_canary]

Prints one JSON row per arm plus a verdict line; exits nonzero unless
healthy passes AND broken fails.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="/tmp/gate4_canary")
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--min_decrease", type=float, default=0.10)
    args = p.parse_args()

    from muscle_tpu.utils.compile_cache import enable, serialize_cpu_codegen

    serialize_cpu_codegen()
    import jax

    jax.config.update("jax_platforms", "cpu")
    enable()

    from muscle_tpu import gates as G

    os.makedirs(args.out_dir, exist_ok=True)
    voc_root = os.path.join(args.out_dir, "synthetic_voc")
    names = G.build_synthetic_voc(
        voc_root, sizes=[(48, 64), (64, 48), (42, 64), (64, 64)]
    )
    labels_path = os.path.join(voc_root, "cls_labels.npy")

    rows = {}
    for arm, lr in (("healthy", 1e-3), ("broken_lr0", 0.0)):
        d = os.path.join(args.out_dir, arm)
        os.makedirs(d, exist_ok=True)
        row = G.gate4_train_mcl(
            voc_root, names, labels_path, d, steps=args.steps,
            min_decrease=args.min_decrease, quick=True, lr=lr,
        )
        row["arm"] = arm
        rows[arm] = row
        print(json.dumps(row), flush=True)

    ok = rows["healthy"]["passed"] and not rows["broken_lr0"]["passed"]
    print(json.dumps({
        "canary": "gate4_lr0",
        "healthy_passed": rows["healthy"]["passed"],
        "broken_failed": not rows["broken_lr0"]["passed"],
        "verdict": "ok" if ok else "GATE IS NOT DISCRIMINATING",
    }), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
