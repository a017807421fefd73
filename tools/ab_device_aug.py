"""A/B: host-augmentation vs --device-aug convergence at flagship scale
(VERDICT round-2 item 6). Round 2 proved equivalence at CFT-S @320; this
runs the same comparison at @640 (CFT-S by default, CFT-L with --scale l)
on a 640px synthetic paired benchmark and tabulates the per-epoch loss and
mAP curves side by side.

Run on the real TPU (serialize with other host-heavy work — the host-aug
leg is CPU-bound):  python tools/ab_device_aug.py --epochs 40
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import yaml

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def parse_results(results_file: Path):
    rows = []
    for line in results_file.read_text().splitlines():
        m = re.search(r"epoch (\d+)/", line)
        if not m:
            continue
        row = {"epoch": int(m.group(1))}
        for k, pat in (("total", r"total ([0-9.]+)"),
                       ("box", r"box ([0-9.]+)"),
                       ("obj", r"obj ([0-9.]+)"),
                       ("map50", r"mAP50 ([0-9.]+)"),
                       ("map", r"mAP ([0-9.]+)")):
            mm = re.search(pat, line)
            if mm:
                row[k] = float(mm.group(1))
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--scale", type=str, default="s", choices=["n", "s", "l"])
    ap.add_argument("--n-train", type=int, default=160)
    ap.add_argument("--n-val", type=int, default=48)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--out", type=str, default="/tmp/ab_devaug")
    ap.add_argument("--skip-host", action="store_true")
    ap.add_argument("--skip-device", action="store_true",
                    help="run only the host leg; the summary still folds "
                         "in a previously completed device leg found under "
                         "--out (rerun-the-hung-leg workflow)")
    args = ap.parse_args()

    from multispectral_object_detection_tpu.cli.train_cli import main as train
    from multispectral_object_detection_tpu.data.synthetic import (
        make_paired_dataset)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    tr_rgb, tr_ir = make_paired_dataset(str(out / "train"),
                                        n_images=args.n_train,
                                        img_size=args.img, nc=2, seed=31)
    va_rgb, va_ir = make_paired_dataset(str(out / "val"),
                                        n_images=args.n_val,
                                        img_size=args.img, nc=2, seed=32)
    dy = out / "data.yaml"
    dy.write_text(yaml.safe_dump({
        "train_rgb": tr_rgb, "train_ir": tr_ir,
        "val_rgb": va_rgb, "val_ir": va_ir,
        "nc": 2, "names": ["red", "blue"]}))

    cfg = f"yolov5{args.scale}_fusion_transformerx3"
    legs = ([] if args.skip_device else [("device", ["--device-aug"])]) + \
        ([] if args.skip_host else [("host", [])])
    results = {}
    for name in ("device", "host"):
        prior = out / "runs" / name / "results.txt"
        if name not in dict(legs) and prior.exists():
            results[name] = parse_results(prior)
    for name, extra in legs:
        print(f"=== leg: {name}-aug ===", flush=True)
        train([
            "--cfg", cfg, "--data", str(dy),
            "--epochs", str(args.epochs), "--batch-size", str(args.batch),
            "--img-size", str(args.img), "--project", str(out / "runs"),
            "--name", name, "--exist-ok", "--max-labels", "60",
            "--noautoanchor", "--eval-every", str(args.eval_every),
            "--ckpt-every", "10",
        ] + extra)
        results[name] = parse_results(out / "runs" / name / "results.txt")

    (out / "ab.json").write_text(json.dumps(results, indent=1))
    lines = [f"| epoch | {' | '.join(f'{n} total / mAP50' for n in results)} |",
             "|---|" + "---|" * len(results)]
    epochs = sorted({r["epoch"] for rs in results.values() for r in rs})
    for e in epochs:
        cells = []
        for n in results:
            row = next((r for r in results[n] if r["epoch"] == e), {})
            cells.append(f"{row.get('total', float('nan')):.4f} / "
                         f"{row.get('map50', float('nan')):.3f}"
                         if "map50" in row else
                         f"{row.get('total', float('nan')):.4f} / -")
        lines.append(f"| {e} | {' | '.join(cells)} |")
    (out / "AB.md").write_text("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
