#!/usr/bin/env python
"""Restart every interrupted training run found under runs/train.

The TPU-native equivalent of utils/aws/resume.py: a run is interrupted when
its `last/` checkpoint exists but meta.json's epoch is below the opt.yaml
epochs. Runs restart sequentially in-process (one TPU program at a time, no
torch.distributed.launch re-spawn needed).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import yaml


def find_interrupted(root: str = "runs/train"):
    out = []
    for meta_path in Path(root).glob("*/last/meta.json"):
        run_dir = meta_path.parent.parent
        opt_path = run_dir / "opt.yaml"
        if not opt_path.exists():
            continue
        meta = json.loads(meta_path.read_text())
        opt = yaml.safe_load(opt_path.read_text())
        if meta.get("epoch", 0) + 1 < opt.get("epochs", 0):
            out.append((run_dir, meta, opt))
    return out


def main():
    ap = argparse.ArgumentParser("resume_runs")
    ap.add_argument("--root", default="runs/train")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    from multispectral_object_detection_tpu.cli.train_cli import run as train_run

    for run_dir, meta, opt in find_interrupted(args.root):
        print(f"resuming {run_dir} from epoch {meta.get('epoch', 0) + 1}"
              f" / {opt['epochs']}")
        if args.dry_run:
            continue
        ns = argparse.Namespace(**opt)
        ns.resume = str(run_dir / "last")
        ns.exist_ok = True
        train_run(ns)


if __name__ == "__main__":
    main()
