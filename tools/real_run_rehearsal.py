"""End-to-end rehearsal of the one-command real-asset runner
(muscle_tpu.cli.real_run — VERDICT r4 item 6), with ZERO real assets:

  1. builds a structured synthetic VOC tree (gates.build_synthetic_voc);
  2. saves randomly-initialised torch checkpoints (.pth) for the MCL enc,
     the seg dec, and the IRN edge net — the same artifact format as the
     reference's published weights;
  3. serves them over a LOCAL http.server (so --weights exercises the
     URL-fetch path, reference from_pretrained semantics,
     efficientnet_pytorch/utils.py:312-322);
  4. drives `python -m muscle_tpu.cli.real_run` with the URLs — quick
     gate tier + seg + eval — exactly the command the day real assets
     appear, minus only the asset paths;
  5. asserts the one-report contract (all gates passed, PNGs written,
     mIoU computed) and prints the report.

Run:
    OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 python tools/real_run_rehearsal.py \
        [--out_dir /tmp/real_run_rehearsal]

Exit 0 iff every stage of the report satisfies its contract.
"""

from __future__ import annotations

import argparse
import functools
import http.server
import json
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="/tmp/real_run_rehearsal")
    args = p.parse_args()

    from muscle_tpu.utils.compile_cache import enable, serialize_cpu_codegen

    serialize_cpu_codegen()
    import jax

    jax.config.update("jax_platforms", "cpu")
    enable()

    import torch

    from muscle_tpu import gates as G

    os.makedirs(args.out_dir, exist_ok=True)
    voc_root = os.path.join(args.out_dir, "voc")
    G.build_synthetic_voc(voc_root, sizes=[(48, 64), (64, 48), (42, 64), (64, 64)])
    list_path = os.path.join(args.out_dir, "val.txt")
    with open(list_path, "w") as f:
        for n in sorted(os.listdir(os.path.join(voc_root, "JPEGImages"))):
            f.write(n[:-4] + "\n")
    labels_path = os.path.join(voc_root, "cls_labels.npy")

    # ---- checkpoints in the reference's artifact format ------------------
    ckpt_dir = os.path.join(args.out_dir, "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    enc_t, _ = G.make_oracle_muscle("efficientnet-b1", mode="enc", layers=1)
    torch.save(enc_t.state_dict(), os.path.join(ckpt_dir, "mcl.pth"))
    dec_t, _ = G.make_oracle_muscle("efficientnet-b1", mode="dec", layers=1)
    torch.save(dec_t.state_dict(), os.path.join(ckpt_dir, "seg.pth"))
    src = G._load_reference()
    import src.backbones.resnet50 as ref_r50
    import src.backbones.resnet50_irn as ref_irn

    orig = ref_r50.resnet50
    ref_r50.resnet50 = lambda pretrained=True, **kw: orig(pretrained=False, **kw)
    try:
        torch.manual_seed(0)
        irn_t = ref_irn.EdgeDisplacement(crop_size=512)
    finally:
        ref_r50.resnet50 = orig
    torch.save(irn_t.state_dict(), os.path.join(ckpt_dir, "irn.pth"))

    # ---- serve them over HTTP (the --weights <url> turnkey path) ---------
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=ckpt_dir
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    print(f"[rehearsal] serving checkpoints at {base}", flush=True)

    # fresh URL-fetch cache so the download actually happens
    os.environ["MUSCLE_TPU_CACHE"] = os.path.join(args.out_dir, "url_cache")

    from muscle_tpu.cli import real_run

    run_out = os.path.join(args.out_dir, "run")
    rv = ["--voc12_root", voc_root, "--list", list_path,
          "--cls_labels", labels_path,
          "--mcl_weights", f"{base}/mcl.pth",
          "--seg_weights", f"{base}/seg.pth",
          "--irn_weights", f"{base}/irn.pth",
          "--out_dir", run_out,
          "--backbone", "efficientnet-b1", "--seg_backbone", "b1",
          # the rehearsal proves plumbing; the quick tier's wall budget
          # measures host contention, not the harness — lift it here (the
          # quiet-host budget evidence is GATES_r05_quick.json)
          "--bifpn", "1", "--quick", "--quick_budget", "86400",
          "--scales", "0.5,1.0,1.5,2.0", "--seg_scales", "0.75,1.0,1.5",
          "--platform", "cpu"]
    print(f"[rehearsal] python -m muscle_tpu.cli.real_run {' '.join(rv)}",
          flush=True)
    real_run.main(rv)

    # also drive the no-CRF fast path (SegTTAEngine output='labels' —
    # device-fused argmax, DEVIATIONS.md #15) through the same CLI
    from muscle_tpu.cli import infer_seg

    nocrf_out = os.path.join(run_out, "seg_nocrf")
    infer_seg.main([
        "--weights", f"{base}/seg.pth", "--infer_list", list_path,
        "--voc12_root", voc_root, "--out_seg", nocrf_out,
        "--bifpn", "1", "--pretrained", "b1", "--crf", "0",
    ])
    n_nocrf = len([f for f in os.listdir(nocrf_out) if f.endswith(".png")])
    httpd.shutdown()

    report = json.load(open(os.path.join(run_out, "real_run_report.json")))
    st = report["stages"]
    st["seg_nocrf_labels_path"] = {"pngs": n_nocrf}
    ok = (
        st.get("gates", {}).get("all_passed", False)
        and st.get("seg", {}).get("pngs", 0) == 4
        and n_nocrf == 4
        and "mIoU" in st.get("eval", {})
        and all(v and v.startswith(os.environ["MUSCLE_TPU_CACHE"])
                for v in report["weights"].values())
    )
    print(json.dumps({"rehearsal": "real_run", "ok": ok, "stages": st}),
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
