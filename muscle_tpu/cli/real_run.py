"""One-command real-asset parity runner (VERDICT r4 item 6).

The day real VOC2012 + the published .pth checkpoints are on disk (or a
URL), this runs the whole acceptance chain unattended and writes ONE
report:

    python -m muscle_tpu.cli.real_run \
        --voc12_root data/VOC2012 --list data/val.txt \
        --cls_labels data/cls_labels.npy \
        --mcl_weights <url|path> --seg_weights <url|path> \
        [--irn_weights <url|path>] --out_dir out/real_run

Stages (select with --stages):
  gates     converter + all fidelity gates vs the torch oracle on the
            SAME weights (muscle_tpu.cli.gates, real mode)
  seg       full seg inference (TTA + CRF + argmax PNGs) with the seg
            checkpoint (muscle_tpu.cli.infer_seg — reference
            infer_seg.py:101-133)
  eval      real VOC mIoU of the seg PNGs vs SegmentationClass GT
            (reference src/evaluation.py; README.md:40-48 numbers)

Everything is also rehearsable with zero real assets:
tools/real_run_rehearsal.py builds a synthetic VOC tree, serves
randomly-initialised torch checkpoints over local HTTP, and drives THIS
command end-to-end (--weights <http://...>) — the committed rehearsal log
is the proof the turnkey path works before the assets exist.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--voc12_root", required=True, type=str)
    p.add_argument("--list", dest="list_path", required=True, type=str)
    p.add_argument("--cls_labels", required=True, type=str)
    p.add_argument("--mcl_weights", default=None, type=str,
                   help=".pth or URL — enc (CAM) checkpoint for the gates")
    p.add_argument("--seg_weights", default=None, type=str,
                   help=".pth or URL — dec checkpoint for gates + seg stage")
    p.add_argument("--irn_weights", default=None, type=str)
    p.add_argument("--out_dir", default="out/real_run", type=str)
    p.add_argument("--stages", default="gates,seg,eval", type=str)
    p.add_argument("--backbone", default="efficientnet-b3", type=str,
                   help="gates oracle backbone (reference MCL: b3)")
    p.add_argument("--seg_backbone", default="b7", type=str,
                   help="seg-stage backbone suffix (reference: b7)")
    p.add_argument("--bifpn", default=3, type=int)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--crf", default=1, type=int)
    p.add_argument("--crf_backend", default="xla",
                   choices=["xla", "native"], type=str)
    p.add_argument("--quick", action="store_true",
                   help="pro-rated quick gate tier (regression canary)")
    p.add_argument("--quick_budget", default=None, type=float,
                   help="override the quick tier's wall budget (seconds) — "
                        "e.g. for rehearsals on loaded hosts where wall "
                        "time measures contention, not the harness")
    p.add_argument("--gates", default="1,1f,2,2e,3,4,5,6,7,7e,t", type=str)
    p.add_argument("--scales", default="0.5,1.0,1.5,2.0", type=str)
    p.add_argument("--seg_scales", default="0.75,1.0,1.5", type=str)
    p.add_argument("--platform", default=None, type=str)
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    log_path = os.path.join(args.out_dir, "real_run.log")
    report: dict = {"stages": {}, "argv": argv}
    t_all = time.time()

    def log(msg: str) -> None:
        line = f"[real_run +{time.time() - t_all:6.0f}s] {msg}"
        print(line, flush=True)
        with open(log_path, "a") as f:
            f.write(line + "\n")

    from muscle_tpu.cli.common import fetch_weights

    weights = {}
    for a in ("mcl_weights", "seg_weights", "irn_weights"):
        src = getattr(args, a)
        if src:
            log(f"fetch {a}: {src}")
            weights[a] = fetch_weights(src)
            log(f"fetch {a} -> {weights[a]} "
                f"({os.path.getsize(weights[a])} bytes)")
        else:
            weights[a] = None
    report["weights"] = {k: v for k, v in weights.items()}

    stages = [s.strip() for s in args.stages.split(",") if s.strip()]

    if "gates" in stages:
        from muscle_tpu.cli import gates as gates_cli

        gates_out = os.path.join(args.out_dir, "gates")
        gv = ["--voc12_root", args.voc12_root, "--list", args.list_path,
              "--cls_labels", args.cls_labels, "--out_dir", gates_out,
              "--backbone", args.backbone, "--gates", args.gates,
              "--scales", args.scales, "--seg_scales", args.seg_scales]
        for a in ("mcl_weights", "seg_weights", "irn_weights"):
            if weights[a]:
                gv += [f"--{a}", weights[a]]
        if args.quick:
            gv += ["--quick"]
        if args.quick_budget is not None:
            gv += ["--quick_budget", str(args.quick_budget)]
        if args.platform:
            gv += ["--platform", args.platform]
        log(f"stage gates: muscle_tpu.cli.gates {' '.join(gv)}")
        t0 = time.time()
        gates_cli.main(gv)
        rows = json.load(open(os.path.join(gates_out, "gates_report.json")))
        n_pass = sum(1 for r in rows if r["passed"])
        report["stages"]["gates"] = {
            "passed": n_pass, "total": len(rows),
            "all_passed": n_pass == len(rows),
            "report": os.path.join(gates_out, "gates_report.json"),
            "seconds": round(time.time() - t0, 1),
        }
        log(f"stage gates done: {n_pass}/{len(rows)} passed")

    if "seg" in stages:
        if not weights["seg_weights"]:
            raise SystemExit("stage seg requires --seg_weights")
        from muscle_tpu.cli import infer_seg

        seg_out = os.path.join(args.out_dir, "seg")
        sv = ["--weights", weights["seg_weights"],
              "--infer_list", args.list_path,
              "--voc12_root", args.voc12_root,
              "--out_seg", seg_out,
              "--bifpn", str(args.bifpn),
              "--pretrained", args.seg_backbone,
              "--batch_size", str(args.batch_size),
              "--crf", str(args.crf), "--crf_backend", args.crf_backend]
        log(f"stage seg: muscle_tpu.cli.infer_seg {' '.join(sv)}")
        t0 = time.time()
        infer_seg.main(sv)
        n_png = len([f for f in os.listdir(seg_out) if f.endswith(".png")])
        report["stages"]["seg"] = {
            "pngs": n_png, "out": seg_out,
            "seconds": round(time.time() - t0, 1),
        }
        log(f"stage seg done: {n_png} PNGs")

    if "eval" in stages:
        from muscle_tpu.data.voc12 import load_img_name_list
        from muscle_tpu.evaluation import evaluate_folder
        from muscle_tpu.evaluation.miou import write_log

        seg_out = os.path.join(args.out_dir, "seg")
        gt_dir = os.path.join(args.voc12_root, "SegmentationClass")
        names = load_img_name_list(args.list_path)
        log(f"stage eval: {len(names)} images, {seg_out} vs {gt_dir}")
        t0 = time.time()
        loglist = evaluate_folder(seg_out, gt_dir, names, 21, "png", None)
        write_log(os.path.join(args.out_dir, "evallog.txt"), loglist,
                  "real_run")
        miou = float(loglist["mIoU"])
        report["stages"]["eval"] = {
            "mIoU": round(miou, 4),
            "seconds": round(time.time() - t0, 1),
        }
        log(f"stage eval done: mIoU {miou:.4f}")

    report["seconds"] = round(time.time() - t_all, 1)
    out_path = os.path.join(args.out_dir, "real_run_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    log(f"report -> {out_path}")
    print(json.dumps({k: v for k, v in report["stages"].items()}))


if __name__ == "__main__":
    main()
