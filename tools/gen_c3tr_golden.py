"""Generate tests/data/c3tr_golden.npz: forward-equivalence golden for the
C3TR / TransformerBlock / nn.MultiheadAttention import path.

Runs the REFERENCE Model (/root/reference/models/yolo.py) under torch-cpu
with torchvision stubbed (it is not installed here and only provides NMS,
which model construction never calls), on a mini config that exercises
Focus -> Conv -> C3TR -> Detect. Dumps the torch state_dict, a random input
batch and the raw per-scale eval outputs.

Usage: python tools/gen_c3tr_golden.py
"""

import json
import sys
import types
from pathlib import Path

import numpy as np

# stub torchvision before the reference imports it (only .ops.nms is touched)
tv = types.ModuleType("torchvision")
tvo = types.ModuleType("torchvision.ops")
tvo.nms = lambda *a, **k: None
tv.ops = tvo
sys.modules.setdefault("torchvision", tv)
sys.modules.setdefault("torchvision.ops", tvo)

import torch  # noqa: E402

sys.path.insert(0, "/root/reference")

CFG = {
    "nc": 2,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [[10, 13, 16, 30, 33, 23],
                [30, 61, 62, 45, 59, 119],
                [116, 90, 156, 198, 373, 326]],
    "backbone": [
        [-1, 1, "Focus", [8, 3]],
        [-1, 1, "Conv", [16, 3, 2]],     # /4
        [-1, 1, "Conv", [16, 3, 2]],     # /8  P3
        [-1, 1, "Conv", [24, 3, 2]],     # /16
        [-1, 1, "C3TR", [24, False]],    # 4   P4 (transformer bottleneck)
        [-1, 1, "Conv", [32, 3, 2]],     # /32 P5
    ],
    "head": [
        [[2, 4, 5], 1, "Detect", ["nc", "anchors"]],
    ],
}


def main():
    from models.yolo import Model

    torch.manual_seed(0)
    out_dir = Path(__file__).resolve().parent.parent / "tests" / "data"

    import tempfile

    import yaml

    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        yaml.safe_dump(CFG, f)
        cfg_path = f.name

    model = Model(cfg_path, ch=3, nc=2).float().eval()
    # make BN stats non-trivial so folding/inference math is pinned
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        _, raw = model(x)

    blob = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    blob["__input__"] = x.numpy()
    for i, r in enumerate(raw):
        blob[f"__out{i}__"] = r.numpy()
    np.savez(out_dir / "c3tr_golden.npz", **blob)
    (out_dir / "c3tr_golden_cfg.json").write_text(json.dumps(CFG))
    print("wrote", out_dir / "c3tr_golden.npz",
          "params:", sum(v.numel() for v in model.parameters()))


if __name__ == "__main__":
    main()
