"""Import reference/Ultralytics-style torch state_dicts into our params.

The reference warm-starts from YOLOv5 `.pt` checkpoints via intersect_dicts
(train.py:517-523). This module maps a torch state_dict — keys like
``model.{i}.conv.weight`` — onto the DetectionModel param/batch_stats layout
(``blocks_{i}/conv/kernel`` ...), handling:

- Conv2d kernels: (O, I, kh, kw) -> (kh, kw, I, O)
- ConvBnAct pairs: conv.weight + bn.{weight,bias,running_mean,running_var}
- Focus / C3 (cv1-cv3 + m.{k} bottlenecks) / SPP / Bottleneck / Detect
- indices follow the graph rows, so any config both sides parse works.

Accepts a plain ``{name: ndarray}`` dict (load a .pt with
``torch.load(...)['model'].state_dict()`` on any machine with torch, then
``np.savez`` it — no torch needed here).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _set(tree: dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_state_dict(sd: Dict[str, np.ndarray],
                       prefix: str = "model.") -> Tuple[dict, dict]:
    """torch state_dict -> (params, batch_stats) trees.

    Unknown/unmappable entries are skipped (use utils.checkpoint.partial_load
    to merge into freshly initialized params, intersect_dicts-style).
    """
    params: dict = {}
    stats: dict = {}
    gpt_raw: dict = {}  # blocks with reference GPT weights, stacked later

    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        parts = rest.split(".")
        idx = parts[0]
        if not idx.isdigit():
            continue
        block = f"blocks_{idx}"
        sub = parts[1:]
        if not sub:
            continue
        if sub[0] in ("trans_blocks", "pos_emb", "ln_f"):
            gpt_raw.setdefault(block, {})[".".join(sub)] = np.asarray(val)
            continue

        # normalize torch module path -> flax module names
        # m.{k} (C3 bottlenecks / Detect convs) -> m{k};
        # tr.{k} (TransformerBlock layers) -> tr{k}; linear (its position
        # embedding) -> pos
        norm = []
        i = 0
        while i < len(sub):
            if (sub[i] in ("m", "tr") and i + 1 < len(sub)
                    and sub[i + 1].isdigit()):
                norm.append(f"{sub[i]}{sub[i + 1]}")
                i += 2
            elif sub[i] == "linear":
                norm.append("pos")
                i += 1
            else:
                norm.append(sub[i])
                i += 1

        leaf = norm[-1]
        mod_path = norm[:-1]
        val = np.asarray(val)

        # nn.MultiheadAttention inside TransformerLayer (common.py:60):
        # packed in-projection + out_proj -> in_proj_w/in_proj_b + out
        if "ma" in norm:
            j = norm.index("ma")
            if leaf == "in_proj_weight":
                _set(params, [block, *norm[:j], "in_proj_w"],
                     np.ascontiguousarray(val.T))
                continue
            if leaf == "in_proj_bias":
                _set(params, [block, *norm[:j], "in_proj_b"], val)
                continue
            if len(norm) > j + 1 and norm[j + 1] == "out_proj":
                mod_path = norm[:j] + ["out"]

        if leaf == "num_batches_tracked":
            continue
        if mod_path and mod_path[-1] == "bn":
            target = {"weight": ("scale", params), "bias": ("bias", params),
                      "running_mean": ("mean", stats),
                      "running_var": ("var", stats)}.get(leaf)
            if target is None:
                continue
            name, tree = target
            _set(tree, [block, *mod_path, name], val)
            continue
        if leaf == "weight":
            if val.ndim == 4:  # conv kernel
                # Detect head convs are named m{k} directly (no .conv level)
                _set(params, [block, *mod_path, "kernel"], _conv_kernel(val))
            elif val.ndim == 2:  # linear kernel (transformer variants)
                _set(params, [block, *mod_path, "kernel"],
                     np.ascontiguousarray(val.T))
            else:
                _set(params, [block, *mod_path, "scale"], val)
            continue
        if leaf == "bias":
            _set(params, [block, *mod_path, "bias"], val)
            continue
        # anchors / anchor_grid buffers: static in our spec

    for block, raw in gpt_raw.items():
        params[block] = {**params.get(block, {}), **_convert_gpt(raw)}
    return params, stats


def _convert_gpt(raw: Dict[str, np.ndarray]) -> dict:
    """Reference GPT weights (models/common.py:549) -> our stacked CFT layout
    (models/fusion.py CrossModalFusion)."""
    n_layers = 1 + max(int(k.split(".")[1]) for k in raw
                       if k.startswith("trans_blocks."))

    def g(i, name):
        return raw[f"trans_blocks.{i}.{name}"]

    out = {
        "pos_emb": raw["pos_emb"],
        "ln_f": np.stack([raw["ln_f.weight"], raw["ln_f.bias"]]),
        "ln1": np.stack([np.stack([g(i, "ln_input.weight"),
                                   g(i, "ln_input.bias")])
                         for i in range(n_layers)]),
        "ln2": np.stack([np.stack([g(i, "ln_output.weight"),
                                   g(i, "ln_output.bias")])
                         for i in range(n_layers)]),
        "qkv_w": np.stack([np.concatenate(
            [g(i, "sa.que_proj.weight").T, g(i, "sa.key_proj.weight").T,
             g(i, "sa.val_proj.weight").T], axis=1) for i in range(n_layers)]),
        "qkv_b": np.stack([np.concatenate(
            [g(i, "sa.que_proj.bias"), g(i, "sa.key_proj.bias"),
             g(i, "sa.val_proj.bias")]) for i in range(n_layers)]),
        "proj_w": np.stack([g(i, "sa.out_proj.weight").T
                            for i in range(n_layers)]),
        "proj_b": np.stack([g(i, "sa.out_proj.bias")
                            for i in range(n_layers)]),
        "fc1_w": np.stack([g(i, "mlp.0.weight").T for i in range(n_layers)]),
        "fc1_b": np.stack([g(i, "mlp.0.bias") for i in range(n_layers)]),
        "fc2_w": np.stack([g(i, "mlp.2.weight").T for i in range(n_layers)]),
        "fc2_b": np.stack([g(i, "mlp.2.bias") for i in range(n_layers)]),
    }
    return out


def load_npz_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a state_dict exported with np.savez(**state_dict)."""
    z = np.load(path)
    return {k: z[k] for k in z.files}
