#!/usr/bin/env python
"""Dump a torch YOLOv5/CFT checkpoint's state_dict to .npz for importing.

The reference saves pickled nn.Modules (train.py:850-866), so unpickling a
`.pt` needs the ORIGINAL repo's classes on sys.path. Run this anywhere torch
plus that repo are available:

    python tools/export_torch_ckpt.py --pt best.pt --repo /path/to/reference \
        --out best_sd.npz

then on the TPU side:

    from multispectral_object_detection_tpu.utils.torch_import import (
        convert_state_dict, load_npz_state_dict)
    from multispectral_object_detection_tpu.utils.checkpoint import partial_load
    params_t, stats_t = convert_state_dict(load_npz_state_dict("best_sd.npz"))
    params, n, total = partial_load(init_params, params_t)
"""

from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser("export_torch_ckpt")
    ap.add_argument("--pt", required=True)
    ap.add_argument("--repo", default="",
                    help="path to the repo defining the pickled classes")
    ap.add_argument("--out", required=True)
    ap.add_argument("--ema", action="store_true",
                    help="export the EMA weights instead of the raw model")
    args = ap.parse_args()

    if args.repo:
        sys.path.insert(0, args.repo)
    import numpy as np
    import torch

    ckpt = torch.load(args.pt, map_location="cpu", weights_only=False)
    model = ckpt.get("ema" if args.ema else "model", ckpt) if isinstance(
        ckpt, dict) else ckpt
    sd = model.float().state_dict() if hasattr(model, "state_dict") else model
    np.savez(args.out, **{k: v.numpy() if hasattr(v, "numpy") else v
                          for k, v in sd.items()})
    print(f"wrote {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
