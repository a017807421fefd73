"""Recipe-parity at scale (follow-up to the CFT leg of tools/parity_harness.py).

The 16-image val set quantizes mAP(0.5:0.95) by a handful of high-IoU
matches (tools/eval_parity.py measured a 1.1 pt swing that vanished at
n_val=128).  The CFT recipe A/B therefore needs its final checkpoints
re-scored on a larger val set before the train-recipe delta means
anything.  This tool evaluates BOTH trained models — the reference's
(torch-trained, imported via utils/torch_import) and ours (EMA leaves of
the train_cli checkpoint) — with ONE evaluator (ours; eval-parity vs the
reference evaluator is already pinned at 0.02 pt, PARITY_synthetic.md) on
a fresh n_val-image set, isolating the *training recipe* difference from
val-sample noise.

Usage:
    JAX_PLATFORMS=cpu python tools/recipe_eval_at_scale.py \
        --run /tmp/parity_cft --cfg yolov5n_fusion_transformerx3 \
        --n-val 128 --img 160
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.eval_parity import make_val  # noqa: E402
from tools.parity_harness import eval_imported  # noqa: E402


def eval_ours_ckpt(ckpt_dir: Path, data_yaml: Path, cfg_name: str,
                   batch: int, img: int):
    """OUR evaluator on OUR trained EMA weights."""
    import jax.numpy as jnp

    from multispectral_object_detection_tpu.data.datasets import (
        BatchLoader, PairedDetectionDataset)
    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import get_config
    from multispectral_object_detection_tpu.train.evaluator import evaluate
    from multispectral_object_detection_tpu.train.trainer import (
        make_eval_forward)
    from multispectral_object_detection_tpu.utils.checkpoint import (
        load_checkpoint)

    data = yaml.safe_load(Path(data_yaml).read_text())
    raw, _ = load_checkpoint(str(ckpt_dir))
    params = raw["ema_params"]
    stats = raw.get("ema_stats") or raw.get("batch_stats", {})

    model = build_model(get_config(cfg_name, nc=data["nc"]),
                        dtype=jnp.float32)
    ds = PairedDetectionDataset.from_sources(
        data["val_rgb"], data["val_ir"], img_size=img, augment=False,
        rect=True, pad=0.5, nc=data["nc"])
    loader = BatchLoader(ds, batch, shuffle=False, max_labels=60,
                         drop_last=False)
    fwd = make_eval_forward(model, two_stream=True)
    return evaluate(fwd, params, stats, loader, nc=data["nc"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=str, default="/tmp/parity_cft",
                    help="parity_harness output dir")
    ap.add_argument("--cfg", type=str,
                    default="yolov5n_fusion_transformerx3")
    ap.add_argument("--n-val", type=int, default=128)
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=37)
    ap.add_argument("--nc", type=int, default=2)
    ap.add_argument("--ckpt", type=str, default="last",
                    help="which of our checkpoints to score (last|best)")
    ap.add_argument("--ours-dirs", nargs="+", default=["ours"],
                    help="run subdirectories holding independent ours legs "
                         "(e.g. 'ours ours_seed0' for a two-seed spread)")
    args = ap.parse_args()

    run = Path(args.run)
    out = run / f"recipe_eval_{args.n_val}"
    out.mkdir(parents=True, exist_ok=True)
    data_yaml, _ = make_val(out, args.n_val, args.img, args.seed, args.nc)

    ref, (n_c, n_t) = eval_imported(out, data_yaml,
                                    run / "ref_weights.npz", args.cfg,
                                    args.batch, args.img)
    print(f"REF-trained (imported {n_c}/{n_t}): mAP50 {ref['map50']:.4f} "
          f"mAP75 {ref['map75']:.4f} mAP {ref['map']:.4f}")

    def _f(d):
        return {k: float(v) for k, v in d.items()
                if isinstance(v, (int, float, np.floating))}

    ours_all = {}
    for sub in args.ours_dirs:
        ours = eval_ours_ckpt(run / sub / "run" / args.ckpt, data_yaml,
                              args.cfg, args.batch, args.img)
        ours_all[sub] = _f(ours)
        print(f"OURS-trained ({sub}/{args.ckpt} EMA): "
              f"mAP50 {ours['map50']:.4f} "
              f"mAP75 {ours['map75']:.4f} mAP {ours['map']:.4f}")
        d50 = (ours["map50"] - ref["map50"]) * 100
        dm = (ours["map"] - ref["map"]) * 100
        print(f"RECIPE DELTA [{sub}] (ours - ref, one evaluator, "
              f"n_val={args.n_val}): "
              f"mAP50 {d50:+.2f} pt   mAP(0.5:0.95) {dm:+.2f} pt")

    (out / "summary.json").write_text(json.dumps(
        dict(ref=_f(ref), ours=ours_all, n_val=args.n_val, img=args.img,
             cfg=args.cfg, ckpt=args.ckpt)))


if __name__ == "__main__":
    main()
