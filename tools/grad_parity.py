"""One-batch cross-framework GRADIENT parity probe.

Forward goldens pin inference; the training-recipe A/B pins 250-epoch
outcomes — this tool pins the layer in between: d(loss)/d(theta) on ONE
identical batch from IDENTICAL weights, reference torch-cpu backward vs
our jax.grad, leaf by leaf.

Protocol:
  1. build the reference Model (models/yolo_test.py:186) from the same
     config YAML, torch init; export its state_dict;
  2. import those exact weights into our DetectionModel
     (utils/torch_import.convert_state_dict);
  3. drive ONE deterministic batch (our loader, augment=False) through
     both train-mode forwards with every dropout p=0;
  4. reference: ComputeLoss (utils/loss.py:88) with the train.py:661-663
     gain scaling + loss.backward(); ours: jax.grad of DetectionLoss with
     scale_gains;
  5. map the torch GRADIENT state_dict through convert_state_dict — all
     its transforms are permutations/stacks/transposes, which commute
     with d/dtheta — and compare per-leaf norm ratio / cosine / rel-err.

Any recipe divergence (gain scaling, assigner, BN semantics, attention
backward, bilinear-resize backward, ...) surfaces here in seconds instead
of after a 250-epoch A/B.  The round-3 missing-gain-scaling bug shows as
obj/cls grad-norm ratios of 16x/40x with --raw-gains.

Usage:
  JAX_PLATFORMS=cpu python tools/grad_parity.py \
      --cfg yolov5n_fusion_transformerx3 --img 160 --batch 4 [--raw-gains]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import tempfile
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
REF = "/root/reference"

from tools.parity_harness import _stub_torchvision  # noqa: E402


def _ref_compat():
    """numpy/torch compatibility shims for the reference codebase
    (mirrors tools/parity_harness.run_reference)."""
    _stub_torchvision()
    for alias, repl in (("int", int), ("float", float), ("bool", bool),
                        ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, repl)
    sys.path.insert(0, REF)
    import torch

    _orig_clamp_ = torch.Tensor.clamp_

    def _clamp_compat(self, min=None, max=None):
        if not torch.is_floating_point(self):
            if isinstance(min, torch.Tensor):
                min = int(min.item())
            if isinstance(max, torch.Tensor):
                max = int(max.item())
        return _orig_clamp_(self, min=min, max=max)

    torch.Tensor.clamp_ = _clamp_compat
    import global_var

    global_var._init()
    global_var.set_value("flag_visual_training_dataset", False)
    return torch


def make_batch(img: int, batch: int, seed: int = 5):
    """Deterministic letterboxed batch from the synthetic paired dataset."""
    from multispectral_object_detection_tpu.data.datasets import (
        BatchLoader, PairedDetectionDataset)
    from multispectral_object_detection_tpu.data.synthetic import (
        make_paired_dataset)

    d = Path(tempfile.mkdtemp(prefix="gradpar_"))
    rgb_dir, ir_dir = make_paired_dataset(str(d), n_images=batch,
                                          img_size=img, nc=2, seed=seed)
    ds = PairedDetectionDataset.from_sources(rgb_dir, ir_dir, img_size=img,
                                             augment=False)
    loader = BatchLoader(ds, batch, shuffle=False, max_labels=60)
    return next(iter(loader))


def ref_grads(cfg_yaml: Path, batch, hyp_scaled: dict, nc: int,
              weights_npz: str = "", f64: bool = False,
              perturb: float = 0.0):
    """Reference forward+backward; returns (state_dict, grads, loss_items)."""
    torch = _ref_compat()
    import torch.nn as tnn
    from models.yolo_test import Model
    from utils.loss import ComputeLoss

    torch.manual_seed(0)
    model = Model(str(cfg_yaml), ch=6, nc=nc)
    if weights_npz:
        z = np.load(weights_npz)
        tsd = {k: torch.from_numpy(z[k]) for k in z.files}
        missing, unexpected = model.load_state_dict(tsd, strict=False)
        print(f"loaded {len(tsd) - len(unexpected)} tensors from "
              f"{weights_npz} ({len(missing)} missing)")
    if perturb:
        g = torch.Generator().manual_seed(7)
        with torch.no_grad():
            for p in model.parameters():
                p.mul_(1 + perturb * torch.randn(p.shape, generator=g))
    if f64:
        model = model.double()
    model.train()
    for m in model.modules():
        if isinstance(m, tnn.Dropout):
            m.p = 0.0
    model.nc = nc
    model.hyp = hyp_scaled
    model.gr = 1.0

    fdt = torch.float64 if f64 else torch.float32
    rgb = torch.from_numpy(np.ascontiguousarray(
        batch["rgb"].transpose(0, 3, 1, 2))).to(fdt) / 255
    ir_np = batch.get("ir", batch["rgb"])
    ir = torch.from_numpy(np.ascontiguousarray(
        ir_np.transpose(0, 3, 1, 2))).to(fdt) / 255
    tm = np.asarray(batch["tmask"]) > 0
    targets = torch.from_numpy(np.asarray(batch["targets"])[tm]).to(fdt)

    pred = model(rgb, ir)
    loss, items = ComputeLoss(model)(pred, targets)
    loss.backward()

    sd = {k: v.detach().numpy().copy()
          for k, v in model.state_dict().items()}
    grads = {k: p.grad.detach().numpy().copy()
             for k, p in model.named_parameters() if p.grad is not None}
    return sd, grads, [float(x) for x in items]


def our_grads(cfg_name: str, sd: dict, batch, img: int, nc: int,
              hyp_scaled: dict, f64: bool = False):
    """jax.grad of our DetectionLoss on the imported reference weights."""
    import jax

    if f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import multispectral_object_detection_tpu.models.model as mdl
    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import get_config
    from multispectral_object_detection_tpu.models.detect import anchor_arrays
    from multispectral_object_detection_tpu.train.loss import (DetectionLoss,
                                                               LossHyp)
    from multispectral_object_detection_tpu.utils.checkpoint import \
        partial_load
    from multispectral_object_detection_tpu.utils.torch_import import \
        convert_state_dict

    # dropout off to make the comparison deterministic
    orig_fusion = mdl.CrossModalFusion
    mdl.CrossModalFusion = functools.partial(
        orig_fusion, embd_drop=0.0, attn_drop=0.0, resid_drop=0.0)
    try:
        model = build_model(get_config(cfg_name, nc=nc),
                            dtype=jnp.float64 if f64 else jnp.float32)
    finally:
        mdl.CrossModalFusion = orig_fusion

    x = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, x, train=False))()
    iparams, istats = convert_state_dict(sd)
    params, n_cp, n_tot = partial_load(variables["params"], iparams)
    stats, n_cs, _ = partial_load(variables.get("batch_stats", {}), istats)
    print(f"imported {n_cp}/{n_tot} param leaves, {n_cs} stats leaves")

    lhyp = LossHyp(box=hyp_scaled["box"], obj=hyp_scaled["obj"],
                   cls=hyp_scaled["cls"], cls_pw=hyp_scaled["cls_pw"],
                   obj_pw=hyp_scaled["obj_pw"],
                   anchor_t=hyp_scaled["anchor_t"],
                   fl_gamma=hyp_scaled["fl_gamma"])
    spec = model.spec
    loss_fn = DetectionLoss(nc=nc, anchors_px=anchor_arrays(spec.anchors),
                            strides=spec.strides, hyp=lhyp)

    fdt = jnp.float64 if f64 else jnp.float32
    rgb = jnp.asarray(batch["rgb"]).astype(fdt) / 255.0
    ir = jnp.asarray(batch.get("ir", batch["rgb"])).astype(fdt) / 255.0
    targets = jnp.asarray(batch["targets"]).astype(fdt)
    tmask = jnp.asarray(batch["tmask"])

    def loss_of(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, rgb, ir, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
        total, comps = loss_fn(out, targets, tmask)
        return total, comps

    (total, comps), grads = jax.jit(
        jax.value_and_grad(loss_of, has_aux=True))(params)
    return grads, {k: float(v) for k, v in comps.items()}, float(total)


def compare(ref_g: dict, our_g, top: int = 12):
    """Map torch grads through the importer layout and diff leaf-by-leaf."""
    import jax

    from multispectral_object_detection_tpu.utils.torch_import import \
        convert_state_dict

    gparams, _ = convert_state_dict(ref_g)

    rows = []

    def walk(path, ref_tree, our_tree):
        if isinstance(ref_tree, dict):
            for k, v in ref_tree.items():
                if not isinstance(our_tree, dict) or k not in our_tree:
                    rows.append((".".join(path + [k]), None, None, None,
                                 "MISSING-IN-OURS"))
                    continue
                walk(path + [k], v, our_tree[k])
            return
        r = np.asarray(ref_tree, dtype=np.float64).ravel()
        o = np.asarray(our_tree, dtype=np.float64).ravel()
        if r.shape != o.shape:
            rows.append((".".join(path), None, None, None,
                         f"SHAPE {r.shape} vs {o.shape}"))
            return
        nr, no = np.linalg.norm(r), np.linalg.norm(o)
        rel = np.linalg.norm(r - o) / (nr + 1e-12)
        cos = float(r @ o / (nr * no + 1e-24)) if nr > 0 and no > 0 else 1.0
        rows.append((".".join(path), nr, no, rel, f"cos {cos:+.6f}"))

    walk([], gparams, our_g)
    n_grads = len(jax.tree.leaves(our_g))
    print(f"\ncompared {len(rows)} reference grad leaves "
          f"(ours has {n_grads} total; extras are reference-frozen or "
          f"non-torch params)")
    bad = [x for x in rows if x[3] is None]
    for name, *_, note in bad:
        print(f"  !! {name}: {note}")
    rows = [x for x in rows if x[3] is not None]
    rows.sort(key=lambda x: -x[3])
    print(f"{'leaf':58s} {'|g_ref|':>10s} {'|g_ours|':>10s} {'rel_err':>9s}")
    for name, nr, no, rel, note in rows[:top]:
        print(f"{name[:58]:58s} {nr:10.4g} {no:10.4g} {rel:9.3g}  {note}")
    worst = rows[0][3] if rows else float("nan")
    med = float(np.median([x[3] for x in rows])) if rows else float("nan")
    return worst, med, len(bad)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", type=str, default="yolov5n_fusion_transformerx3")
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--nc", type=int, default=2)
    ap.add_argument("--raw-gains", action="store_true",
                    help="skip the train.py:661-663 gain rescaling on OUR "
                         "side only (demonstrates the round-3 bug)")
    ap.add_argument("--weights-npz", type=str, default="",
                    help="state_dict npz to load into BOTH sides instead of "
                         "torch init (e.g. a trained ref_weights.npz); at "
                         "torch-init, train-mode BN normalizes by "
                         "near-zero batch variances and amplifies fp noise, "
                         "clouding the comparison")
    ap.add_argument("--f64", action="store_true",
                    help="run BOTH frameworks in float64. Distinguishes "
                         "fp-noise amplification (train-mode BN chains, "
                         "~200 layers) from structural divergence: fp "
                         "noise collapses by ~1e9, a real assigner/"
                         "forward difference persists. Caveat: our Conv "
                         "blocks pin BN compute to fp32 (layers.py), so "
                         "our side keeps fp32 noise — prefer --self-noise "
                         "for the chaos control")
    ap.add_argument("--self-noise", action="store_true",
                    help="control experiment INSIDE one framework: compare "
                         "the reference's fp32 gradients against the "
                         "reference's OWN fp64 gradients (identical "
                         "weights/batch; the only change is arithmetic "
                         "precision). The resulting rel_err is the "
                         "gradient's intrinsic sensitivity to fp noise — "
                         "the floor below which no cross-framework fp32 "
                         "comparison can land")
    ap.add_argument("--self-perturb", type=float, default=0.0,
                    help="like --self-noise but perturbing the reference's "
                         "own fp32 weights by this relative noise (e.g. "
                         "1e-7 ~ the representation/op-order difference "
                         "scale between two fp32 frameworks) instead of "
                         "switching precision")
    ap.add_argument("--json", type=str, default="")
    args = ap.parse_args()

    from multispectral_object_detection_tpu.data.hyps import load_hyp
    from multispectral_object_detection_tpu.models.configs import get_config

    batch = make_batch(args.img, args.batch)
    hyp = load_hyp("scratch")
    nl = 3
    scaled = dict(hyp)
    scaled["box"] = hyp["box"] * 3.0 / nl
    scaled["cls"] = hyp["cls"] * args.nc / 80.0 * 3.0 / nl
    scaled["obj"] = hyp["obj"] * (args.img / 640.0) ** 2 * 3.0 / nl
    scaled["label_smoothing"] = 0.0

    cfg = get_config(args.cfg, nc=args.nc)
    d = Path(tempfile.mkdtemp(prefix="gradpar_cfg_"))
    cfg_yaml = d / "model.yaml"
    cfg_yaml.write_text(yaml.safe_dump(cfg))

    if args.self_noise or args.self_perturb:
        from multispectral_object_detection_tpu.utils.torch_import import \
            convert_state_dict

        _, rg32, items32 = ref_grads(cfg_yaml, batch, scaled, args.nc,
                                     args.weights_npz, f64=False)
        print(f"REF base loss items (box obj cls total): "
              f"{' '.join(f'{x:.6f}' for x in items32)}")
        _, rg64, items64 = ref_grads(cfg_yaml, batch, scaled, args.nc,
                                     args.weights_npz,
                                     f64=not args.self_perturb,
                                     perturb=args.self_perturb)
        what = (f"fp32+{args.self_perturb:g}-perturbed"
                if args.self_perturb else "fp64")
        print(f"REF {what} loss items (box obj cls total): "
              f"{' '.join(f'{x:.6f}' for x in items64)}")
        g64, _ = convert_state_dict(rg64)
        worst, med, n_bad = compare(rg32, g64)
        loss_rel = max(abs(a - b) / (abs(a) + 1e-12)
                       for a, b in zip(items32, items64))
        print(f"\nREF-vs-REF (fp32 vs {what}): worst rel_err {worst:.4g}   "
              f"median rel_err {med:.4g}   max loss-item rel {loss_rel:.3g}")
        print("This is the intrinsic fp-noise sensitivity of the gradient "
              "on this batch — a cross-framework fp32 comparison cannot "
              "resolve recipe differences below it.")
        if args.json:
            Path(args.json).write_text(json.dumps(
                {"cfg": args.cfg, "mode": f"self_noise:{what}",
                 "worst_rel_err": float(worst), "median_rel_err": float(med),
                 "loss_rel_max": float(loss_rel),
                 "ref_items_base": items32, "ref_items_b": items64}))
        return 0

    sd, rg, items = ref_grads(cfg_yaml, batch, scaled, args.nc,
                              args.weights_npz, f64=args.f64)
    print(f"REF  loss items (box obj cls total): "
          f"{' '.join(f'{x:.6f}' for x in items)}")

    ours_hyp = dict(hyp, label_smoothing=0.0) if args.raw_gains else scaled
    og, comps, total = our_grads(args.cfg, sd, batch, args.img, args.nc,
                                 ours_hyp, f64=args.f64)
    print(f"OURS loss items (box obj cls total): "
          f"{comps['box']:.6f} {comps['obj']:.6f} {comps['cls']:.6f} "
          f"{total:.6f}")

    worst, med, n_bad = compare(rg, og)
    print(f"\nworst rel_err {worst:.4g}   median rel_err {med:.4g}   "
          f"unmapped {n_bad}")
    ok = bool(worst < 5e-3 and n_bad == 0)  # builtin bool: np.bool_ isn't JSON
    print("GRAD PARITY:", "PASS" if ok else "FAIL")
    if args.json:
        Path(args.json).write_text(json.dumps(
            {"cfg": args.cfg, "worst_rel_err": float(worst),
             "median_rel_err": float(med),
             "unmapped": n_bad, "ok": ok, "ref_items": items,
             "our_items": [comps["box"], comps["obj"], comps["cls"], total]}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
