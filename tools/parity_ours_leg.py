"""Run ONLY the 'ours train+eval' leg of the cross-framework parity A/B.

The parity harness's reference leg (torch-cpu, ~hours) and the eval-import
leg were completed earlier in round 4 (PARITY_synthetic.md, commit c1b6981:
reference 0.8605/0.5697, imported-weights delta 0.00 pt) but the session
ended with the ours recipe leg in flight and /tmp — where ref_weights.npz
lived — was wiped. The synthetic dataset is seed-pinned (make_data: train
seed 11 / val seed 23), so the ours leg is exactly reproducible standalone;
this script regenerates the identical data and runs just run_ours.

Usage: python tools/parity_ours_leg.py [--nc 4] [--epochs 250] ...
Prints one JSON line with the final self-evaluated mAP50/mAP.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parity_harness import make_data, run_ours  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="yolov5n_fusion_transformerx3")
    ap.add_argument("--epochs", type=int, default=250)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--nc", type=int, default=4)
    ap.add_argument("--out", default="/tmp/parity_nc4")
    ap.add_argument("--eval-every", type=int, default=50,
                    help="in-train eval cadence (final epoch always evals)")
    ap.add_argument("--ckpt-every", type=int, default=50,
                    help="last-ckpt cadence (final epoch always saves)")
    ap.add_argument("--seed", type=int, default=None,
                    help="training seed (init/aug draws); same data either "
                         "way. Re-run with a second seed to measure the "
                         "outcome spread of the recipe at this scale.")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    data_yaml = make_data(out, args.n_train, args.n_val, args.img, args.nc)
    res = run_ours(out, data_yaml, args.cfg, args.epochs, args.batch,
                   args.img,
                   extra=("--eval-every", str(args.eval_every),
                          "--ckpt-every", str(args.ckpt_every),
                          *(("--seed", str(args.seed))
                            if args.seed is not None else ())))
    print(json.dumps({
        "cfg": args.cfg, "nc": args.nc, "epochs": args.epochs,
        "map50": float(res["map50"]), "map": float(res["map"]),
        "pos_emb_zero": bool(res["pos_emb_zero"]),
    }), flush=True)


if __name__ == "__main__":
    main()
