"""Eval-parity at scale (follow-up to tools/parity_harness.py).

The round-2 parity campaign showed |Δ mAP50| = 0.07 pt but a 1.1 pt
mAP(0.5:0.95) delta on a 16-image val set — small enough to be match-count
quantization at high IoU thresholds. This tool decides that: it evaluates
the SAME reference-trained weights on a FRESH, larger val set with

  (a) the reference's own evaluator (test.py:21 test(), torch-cpu), and
  (b) our evaluator on the imported weights (utils/torch_import),

and prints both. If the 0.5:0.95 delta shrinks with n_val, the round-2
number was noise; if it stays ~1 pt it is systematic.

Usage:
    JAX_PLATFORMS=cpu python tools/eval_parity.py \
        --ref-run /tmp/parity_250 --n-val 128 --img 160 --out /tmp/evalpar
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parent.parent
REF = "/root/reference"
sys.path.insert(0, str(REPO))

from tools.parity_harness import _stub_torchvision, eval_imported  # noqa: E402


def make_val(out: Path, n_val: int, img: int, seed: int, nc: int = 2):
    from multispectral_object_detection_tpu.data.synthetic import (
        make_paired_dataset)

    va_rgb, va_ir = make_paired_dataset(str(out / "val"), n_images=n_val,
                                        img_size=img, nc=nc, seed=seed)
    names = ["red", "blue"] if nc == 2 else [f"c{i}" for i in range(nc)]
    data = {"train_rgb": va_rgb, "train_ir": va_ir,   # unused; keys required
            "val_rgb": va_rgb, "val_ir": va_ir,
            "nc": nc, "names": names}
    dy = out / "data.yaml"
    dy.write_text(yaml.safe_dump(data))
    return dy, data


def ref_eval(ckpt_pt: Path, data: dict, batch: int, img: int):
    """Reference test.test() on torch-cpu with the pickled EMA model."""
    _stub_torchvision()
    for alias, repl in (("int", int), ("float", float), ("bool", bool),
                        ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, repl)
    sys.path.insert(0, REF)
    import torch

    _orig_load = torch.load

    def _load_compat(*a, **k):
        k.setdefault("weights_only", False)
        return _orig_load(*a, **k)

    torch.load = _load_compat

    import global_var
    global_var._init()
    global_var.set_value("flag_visual_training_dataset", False)

    import test as ref_test
    from utils.datasets import create_dataloader_rgb_ir

    ckpt = torch.load(ckpt_pt, map_location="cpu")
    model = ckpt["ema"] if ckpt.get("ema") is not None else ckpt["model"]
    model = model.float().eval()
    gs = max(int(model.stride.max()), 32)

    opt = argparse.Namespace(single_cls=False)
    loader = create_dataloader_rgb_ir(
        data["val_rgb"], data["val_ir"], img, batch, gs, opt,
        pad=0.5, rect=True)[0]

    results, _, _ = ref_test.test(
        dict(data), batch_size=batch, imgsz=img, model=model,
        dataloader=loader, save_dir=Path("/tmp/ref_eval_sd"),
        plots=False, half_precision=False)
    mp, mr, map50, map75, map_ = results[:5]
    return dict(map50=float(map50), map75=float(map75), map=float(map_),
                mp=float(mp), mr=float(mr))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-run", type=str, default="/tmp/parity_250",
                    help="parity_harness output dir (ckpt + npz weights)")
    ap.add_argument("--cfg", type=str, default="yolov5n_fusion_add")
    ap.add_argument("--n-val", type=int, default=128)
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=37)
    ap.add_argument("--out", type=str, default="/tmp/evalpar")
    args = ap.parse_args()

    run = Path(args.ref_run)
    ckpt = run / "ref_run" / "weights" / "last.pt"
    npz = run / "ref_weights.npz"
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    data_yaml, data = make_val(out, args.n_val, args.img, args.seed)

    ours, (n_c, n_t) = eval_imported(out, data_yaml, npz, args.cfg,
                                     args.batch, args.img)
    print(f"OURS   (imported {n_c}/{n_t}): mAP50 {ours['map50']:.4f} "
          f"mAP75 {ours['map75']:.4f} mAP {ours['map']:.4f}")

    ref = ref_eval(ckpt, data, args.batch, args.img)
    print(f"REF    (torch-cpu test.test): mAP50 {ref['map50']:.4f} "
          f"mAP75 {ref['map75']:.4f} mAP {ref['map']:.4f}")
    d50 = abs(ours["map50"] - ref["map50"]) * 100
    dm = abs(ours["map"] - ref["map"]) * 100
    print(f"DELTA  mAP50 {d50:.2f} pt   mAP(0.5:0.95) {dm:.2f} pt   "
          f"(n_val={args.n_val})")
    ours_s = {k: float(v) for k, v in ours.items()
              if isinstance(v, (int, float, np.floating))}
    (out / "summary.json").write_text(json.dumps(
        dict(ours=ours_s, ref=ref, n_val=args.n_val, img=args.img)))


if __name__ == "__main__":
    main()
