"""End-to-end evidence run: train the flagship tracker on rendered
multi-sequence video, then report HOTA/MOTA/IDF1/mAP from TrackValidator
on held-out sequences (VERDICT round-1 item #3 — the analogue of the
reference's `run_test.py` / `MOTR/configs/r50_motr_eval.sh` recipes).

Usage:
  python scripts/real_eval.py [--root /tmp/synth_mot] [--imgsz 320]
      [--epochs 12] [--clip-len 3] [--out runs/real_eval]
  python scripts/real_eval.py --full     # FLAGSHIP config (round-3
      VERDICT #3): 640^2, 300 slots, clip_len 5, nc=2, 8 objects with
      crossings, augment on, EMA-weight validation
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_mot")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--clip-len", type=int, default=3)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--max-gt", type=int, default=16)
    ap.add_argument("--conf", type=float, default=0.5)
    ap.add_argument("--out", default="runs/real_eval")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--augment", action="store_true")
    ap.add_argument("--nc", type=int, default=1)
    ap.add_argument("--objects", type=int, default=4)
    ap.add_argument("--accumulate", type=int, default=1)
    ap.add_argument("--val-every", type=int, default=0)
    ap.add_argument("--full", action="store_true",
                    help="flagship preset: 640px / clip 5 / nc 2 / "
                         "8 objects / augment")
    args = ap.parse_args()
    if args.full:
        args.imgsz = 640
        args.clip_len = 5
        args.nc = 2
        args.objects = 8
        args.max_gt = 32
        args.augment = True
        if args.root == "/tmp/synth_mot":
            args.root = "/tmp/synth_mot_flagship"
        if args.out == "runs/real_eval":
            args.out = "runs/real_eval_flagship"


    yaml_path = os.path.join(args.root, "synth_mot.yaml")
    if not os.path.isfile(yaml_path):
        from scripts.make_synth_mot import make_dataset
        print(f"rendering dataset into {args.root} ...", flush=True)
        yaml_path = make_dataset(args.root, size=args.imgsz,
                                 n_frames=args.frames, n_obj=args.objects,
                                 nc=args.nc)

    from mo_yolo_tpu.api import MOTRTrack

    t0 = time.time()
    m = MOTRTrack("yolo_track.yaml", nc=args.nc, imgsz=args.imgsz)
    print(f"model built in {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    train_metrics = m.train(yaml_path, epochs=args.epochs,
                            clip_len=args.clip_len, lr=args.lr,
                            max_gt=args.max_gt, save_dir=args.out,
                            log_every=20, resume=args.resume,
                            augment=args.augment,
                            accumulate=args.accumulate,
                            val_every=args.val_every)
    train_s = time.time() - t0
    print(f"train done in {train_s:.0f}s: {train_metrics}", flush=True)

    t0 = time.time()
    from mo_yolo_tpu.data.dataset import load_dataset_yaml
    d = load_dataset_yaml(yaml_path)
    metrics = m.val(d["val"], conf=args.conf, max_gt=args.max_gt)
    val_s = time.time() - t0

    out = {
        "dataset": {"root": args.root, "imgsz": args.imgsz,
                    "val_frames": len(d["val"])},
        "train": {"epochs": args.epochs, "clip_len": args.clip_len,
                  "lr": args.lr, "seconds": round(train_s, 1),
                  "final_loss": train_metrics.get("final_loss")},
        "val": {k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in metrics.items()},
        "val_seconds": round(val_s, 1),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "real_eval.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
