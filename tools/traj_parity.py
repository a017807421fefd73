"""Multi-step cross-framework OPTIMIZER-TRAJECTORY parity probe.

tools/grad_parity.py pins d(loss)/d(theta) on one batch; the 250-epoch
A/B pins final mAP. This tool pins the recipe layer in between: K
micro-batch updates of the FULL training recipe — SGD 3-group
warmup-ramped LR/momentum, accumulate ramp, coupled weight decay,
nesterov momentum, emission-gated EMA (train.py:712-799) — on a fixed
deterministic batch sequence (no augmentation) from IDENTICAL init
weights, reference torch-cpu vs this repo's optax transformation + jitted
train step. After K steps the two frameworks' params / EMA / BN running
stats are mapped through utils/torch_import and compared leaf-by-leaf.

If the trajectories match, any recipe-level mAP delta in the 250-epoch
A/B (e.g. the round-3 +6.3 pt mAP(.5:.95) in our favor,
PARITY_synthetic.md) must originate OUTSIDE the update rule — i.e. in
the stochastic data pipeline (mosaic/affine/HSV RNG streams, shuffle
order), which is inherently framework-specific.

Usage (note `env -u`: the axon sitecustomize, triggered by
PALLAS_AXON_POOL_IPS, force-selects the TPU backend even under
JAX_PLATFORMS=cpu — same reason __graft_entry__ pops it):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/traj_parity.py \
      --cfg yolov5n_fusion_transformerx3 --img 160 --batch 4 --steps 24
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

from tools.grad_parity import _ref_compat, make_batch  # noqa: E402


def make_batches(img: int, batch: int, n_batches: int, seed0: int = 5):
    """n deterministic letterboxed batches (distinct seeds, no augment)."""
    return [make_batch(img, batch, seed=seed0 + 17 * i)
            for i in range(n_batches)]


def one_cycle(y2, epochs):
    import math

    return lambda x: ((1 + math.cos(x * math.pi / epochs)) / 2) * (1 - y2) + y2


def ref_trajectory(cfg_yaml: Path, batches, hyp: dict, scaled: dict, nc: int,
                   steps: int, nb: int, epochs: int, total_bs: int,
                   weights_npz: str = ""):
    """Reference recipe for `steps` micro-batches; returns state dicts.

    Re-drives the exact per-batch mechanics of train.py:673-799 with the
    reference's own Model / ComputeLoss / ModelEMA / SGD grouping
    (train.py:541-577) — only the data loader and the epoch scaffolding
    are replaced by the fixed batch list.
    """
    torch = _ref_compat()
    import torch.nn as tnn
    import torch.optim as topt
    from models.yolo_test import Model
    from utils.loss import ComputeLoss
    from utils.torch_utils import ModelEMA

    torch.manual_seed(0)
    model = Model(str(cfg_yaml), ch=6, nc=nc)
    if weights_npz:  # trained init: BN vars are O(1), no fp-noise blow-up
        z = np.load(weights_npz)
        tsd = {k: torch.from_numpy(z[k]) for k in z.files}
        missing, unexpected = model.load_state_dict(tsd, strict=False)
        print(f"loaded {len(tsd) - len(unexpected)} tensors from "
              f"{weights_npz} ({len(missing)} missing)")
    model.train()
    for m in model.modules():
        if isinstance(m, tnn.Dropout):
            m.p = 0.0
    model.nc, model.hyp, model.gr = nc, scaled, 1.0
    init_sd = {k: v.detach().numpy().copy()
               for k, v in model.float().state_dict().items()}

    # train.py:541-560 optimizer grouping
    nbs = 64
    accumulate_nom = max(round(nbs / total_bs), 1)
    wd = hyp["weight_decay"] * total_bs * accumulate_nom / nbs
    pg0, pg1, pg2 = [], [], []
    for m in model.modules():
        if hasattr(m, "bias") and isinstance(m.bias, tnn.Parameter):
            pg2.append(m.bias)
        if isinstance(m, tnn.BatchNorm2d):
            pg0.append(m.weight)
        elif hasattr(m, "weight") and isinstance(m.weight, tnn.Parameter):
            pg1.append(m.weight)
    opt = topt.SGD(pg0, lr=hyp["lr0"], momentum=hyp["momentum"],
                   nesterov=True)
    opt.add_param_group({"params": pg1, "weight_decay": wd})
    opt.add_param_group({"params": pg2})
    lf = one_cycle(hyp["lrf"], epochs)
    sched = topt.lr_scheduler.LambdaLR(opt, lr_lambda=lf)
    ema = ModelEMA(model)
    compute_loss = ComputeLoss(model)

    nw = max(round(hyp["warmup_epochs"] * nb), 1000)
    losses = []
    opt.zero_grad()
    accumulate = accumulate_nom
    for ni in range(steps):
        epoch = ni // nb
        if ni <= nw:  # train.py:735-744
            xi = [0, nw]
            accumulate = max(1, np.interp(
                ni, xi, [1, nbs / total_bs]).round())
            for j, x in enumerate(opt.param_groups):
                x["lr"] = np.interp(
                    ni, xi,
                    [hyp["warmup_bias_lr"] if j == 2 else 0.0,
                     x["initial_lr"] * lf(epoch)])
                if "momentum" in x:
                    x["momentum"] = np.interp(
                        ni, xi, [hyp["warmup_momentum"], hyp["momentum"]])
        b = batches[ni % len(batches)]
        rgb = torch.from_numpy(np.ascontiguousarray(
            b["rgb"].transpose(0, 3, 1, 2))).float() / 255
        ir = torch.from_numpy(np.ascontiguousarray(
            b.get("ir", b["rgb"]).transpose(0, 3, 1, 2))).float() / 255
        tm = np.asarray(b["tmask"]) > 0
        targets = torch.from_numpy(np.asarray(b["targets"])[tm]).float()
        pred = model(rgb, ir)
        loss, _ = compute_loss(pred, targets)
        loss.backward()
        losses.append(float(loss))
        if ni % accumulate == 0:  # train.py:768-773
            opt.step()
            opt.zero_grad()
            ema.update(model)
        if nb and (ni + 1) % nb == 0:  # epoch boundary (train.py:799)
            sched.step()

    final = {k: v.detach().numpy().copy()
             for k, v in model.float().state_dict().items()}
    ema_sd = {k: v.detach().numpy().copy()
              for k, v in ema.ema.float().state_dict().items()}
    return init_sd, final, ema_sd, losses, int(ema.updates)


def our_trajectory(cfg_name: str, init_sd: dict, batches, img: int, nc: int,
                   hyp: dict, scaled: dict, steps: int, nb: int, epochs: int,
                   total_bs: int):
    """Same K micro-batches through our jitted train step from the imported
    reference init weights."""
    import jax
    import jax.numpy as jnp

    import multispectral_object_detection_tpu.models.model as mdl
    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import get_config
    from multispectral_object_detection_tpu.models.detect import anchor_arrays
    from multispectral_object_detection_tpu.train.loss import (DetectionLoss,
                                                               LossHyp)
    from multispectral_object_detection_tpu.train.optim import (OptHyp,
                                                                build_optimizer)
    from multispectral_object_detection_tpu.train.trainer import (
        create_train_state, make_train_step)
    from multispectral_object_detection_tpu.utils.checkpoint import \
        partial_load
    from multispectral_object_detection_tpu.utils.torch_import import \
        convert_state_dict

    orig_fusion = mdl.CrossModalFusion
    mdl.CrossModalFusion = functools.partial(
        orig_fusion, embd_drop=0.0, attn_drop=0.0, resid_drop=0.0)
    try:
        model = build_model(get_config(cfg_name, nc=nc), dtype=jnp.float32)
    finally:
        mdl.CrossModalFusion = orig_fusion

    ohyp = OptHyp(lr0=hyp["lr0"], lrf=hyp["lrf"], momentum=hyp["momentum"],
                  weight_decay=hyp["weight_decay"],
                  warmup_epochs=hyp["warmup_epochs"],
                  warmup_momentum=hyp["warmup_momentum"],
                  warmup_bias_lr=hyp["warmup_bias_lr"])
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, x,
                                               train=False))
    tx, _ = build_optimizer(shapes["params"], ohyp, steps_per_epoch=nb,
                            epochs=epochs,
                            accumulate=max(round(64 / total_bs), 1),
                            total_batch_size=total_bs)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), x, x)
    iparams, istats = convert_state_dict(init_sd)
    params, n_cp, n_tot = partial_load(state.params, iparams)
    stats, n_cs, _ = partial_load(state.batch_stats, istats)
    print(f"imported {n_cp}/{n_tot} param leaves, {n_cs} stats leaves")
    state = state.replace(params=params, batch_stats=stats,
                          ema_params=jax.tree.map(jnp.copy, params),
                          ema_stats=jax.tree.map(jnp.copy, stats),
                          opt_state=tx.init(params))

    spec = model.spec
    loss_fn = DetectionLoss(
        nc=nc, anchors_px=anchor_arrays(spec.anchors), strides=spec.strides,
        hyp=LossHyp(box=scaled["box"], obj=scaled["obj"], cls=scaled["cls"],
                    cls_pw=scaled["cls_pw"], obj_pw=scaled["obj_pw"],
                    anchor_t=scaled["anchor_t"], fl_gamma=scaled["fl_gamma"]))
    step = make_train_step(model, loss_fn, tx, two_stream=True, donate=False)

    losses = []
    for ni in range(steps):
        b = batches[ni % len(batches)]
        state, m = step(state, jnp.asarray(b["rgb"]),
                        jnp.asarray(b.get("ir", b["rgb"])),
                        jnp.asarray(b["targets"]), jnp.asarray(b["tmask"]),
                        jax.random.PRNGKey(1))
        losses.append(float(m["total"]))  # both sides report loss*bs
    return (state.params, state.batch_stats, state.ema_params,
            state.ema_stats, losses, int(state.ema_updates))


def compare_trees(name: str, init_sd: dict, ref_sd: dict, our_params,
                  our_stats):
    """Map torch state_dicts through the importer and diff leaf-by-leaf
    against our (params, stats) trees. Two verdict metrics, both immune
    to near-zero-magnitude denominators on individual leaves:
      - GLOBAL update-delta rel err: ||dR - dO||/||dR|| over the
        concatenated tree (d = final - init) — measures the K
        accumulated optimizer updates as one vector;
      - worst per-leaf VALUE rel err ||r-o||/||r|| — final states must
        agree leaf-by-leaf (leaf values are O(1) after init, so this
        denominator is safe).
    Per-leaf delta rel err is printed for context only (it explodes on
    leaves whose true update is ~0, e.g. BN scales with epsilon
    gradients). Returns (global_delta_rel, worst_value_rel, unmapped)."""
    from multispectral_object_detection_tpu.utils.torch_import import \
        convert_state_dict

    gp, gs = convert_state_dict(ref_sd)
    ip, istats = convert_state_dict(init_sd)
    rows, bad = [], []

    def walk(path, ref_tree, init_tree, our_tree):
        if isinstance(ref_tree, dict):
            for k, v in ref_tree.items():
                if not isinstance(our_tree, dict) or k not in our_tree:
                    bad.append(".".join(path + [k]))
                    continue
                walk(path + [k], v, init_tree[k], our_tree[k])
            return
        r = np.asarray(ref_tree, np.float64).ravel()
        i = np.asarray(init_tree, np.float64).ravel()
        o = np.asarray(our_tree, np.float64).ravel()
        if r.shape != o.shape:
            bad.append(".".join(path) + f" SHAPE {r.shape} vs {o.shape}")
            return
        dr, do = r - i, o - i
        acc["dd"] += float(np.sum((dr - do) ** 2))
        acc["dn"] += float(np.sum(dr ** 2))
        drel = np.linalg.norm(dr - do) / (np.linalg.norm(dr) + 1e-12)
        vrel = np.linalg.norm(r - o) / (np.linalg.norm(r) + 1e-12)
        rows.append((".".join(path), drel, vrel))

    acc = {"dd": 0.0, "dn": 0.0}
    walk([], gp, ip, our_params)
    walk([], gs, istats, our_stats)
    gdrel = (acc["dd"] ** 0.5) / (acc["dn"] ** 0.5 + 1e-12)
    worst_v = max((t[2] for t in rows), default=float("nan"))
    rows.sort(key=lambda t: -t[2])
    print(f"\n[{name}] {len(rows)} leaves compared, {len(bad)} unmapped; "
          f"GLOBAL delta_rel {gdrel:.3g}, worst value_rel {worst_v:.3g}")
    for leaf, drel, vrel in rows[:8]:
        print(f"  {leaf[:56]:56s} value_rel {vrel:<10.3g} delta_rel "
              f"{drel:.3g}")
    for b in bad[:8]:
        print(f"  !! {b}")
    return gdrel, worst_v, len(bad)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", type=str, default="yolov5n_fusion_transformerx3")
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--nc", type=int, default=2)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--n-batches", type=int, default=4)
    ap.add_argument("--nb", type=int, default=8,
                    help="steps per epoch (LR staircase / warmup length)")
    ap.add_argument("--epochs", type=int, default=250)
    ap.add_argument("--json", type=str, default="")
    ap.add_argument("--weights-npz", type=str, default="",
                    help="torch state_dict npz to start BOTH trajectories "
                         "from (e.g. a trained ref_weights.npz) instead of "
                         "torch init — at init, train-mode BN divides by "
                         "near-zero batch variances and amplifies fp noise "
                         "(see tools/grad_parity.py)")
    ap.add_argument("--tol", type=float, default=5e-3,
                    help="PASS bar on worst update-delta rel err and max "
                         "per-step loss rel err. Use the default with a "
                         "handful of steps (the update rule is checked "
                         "before fp32 op-order noise compounds through "
                         "BN); long horizons measure chaotic drift and "
                         "need a looser bar.")
    args = ap.parse_args()

    from multispectral_object_detection_tpu.data.hyps import load_hyp
    from multispectral_object_detection_tpu.models.configs import get_config

    hyp = load_hyp("scratch")
    nl = 3
    scaled = dict(hyp)
    scaled["box"] = hyp["box"] * 3.0 / nl
    scaled["cls"] = hyp["cls"] * args.nc / 80.0 * 3.0 / nl
    scaled["obj"] = hyp["obj"] * (args.img / 640.0) ** 2 * 3.0 / nl
    scaled["label_smoothing"] = 0.0

    batches = make_batches(args.img, args.batch, args.n_batches)
    cfg = get_config(args.cfg, nc=args.nc)
    d = Path(tempfile.mkdtemp(prefix="trajpar_"))
    cfg_yaml = d / "model.yaml"
    cfg_yaml.write_text(yaml.safe_dump(cfg))

    init_sd, ref_final, ref_ema, ref_losses, ref_updates = ref_trajectory(
        cfg_yaml, batches, hyp, scaled, args.nc, args.steps, args.nb,
        args.epochs, args.batch, args.weights_npz)
    (our_params, our_stats, our_ema_p, our_ema_s, our_losses,
     our_updates) = our_trajectory(
        args.cfg, init_sd, batches, args.img, args.nc, hyp, scaled,
        args.steps, args.nb, args.epochs, args.batch)

    print("\nstep |   ref loss   |   our loss   |  rel")
    for i, (a, b) in enumerate(zip(ref_losses, our_losses)):
        print(f"{i:4d} | {a:12.6f} | {b:12.6f} | "
              f"{abs(a - b) / (abs(a) + 1e-12):.3g}")
    print(f"\nEMA updates: ref {ref_updates}  ours {our_updates}")

    gp_rel, wv_p, bp = compare_trees("params after K steps", init_sd,
                                     ref_final, our_params, our_stats)
    ge_rel, wv_e, be = compare_trees("EMA after K steps", init_sd, ref_ema,
                                     our_ema_p, our_ema_s)
    loss_rel = max(abs(a - b) / (abs(a) + 1e-12)
                   for a, b in zip(ref_losses, our_losses))
    ok = bool(gp_rel < args.tol and ge_rel < args.tol
              and wv_p < args.tol and wv_e < args.tol and bp == 0 and be == 0
              and ref_updates == our_updates and loss_rel < args.tol)
    print(f"\nTRAJECTORY PARITY ({args.steps} steps, tol {args.tol:g}): "
          f"{'PASS' if ok else 'FAIL'}")
    if args.json:
        Path(args.json).write_text(json.dumps(
            {"cfg": args.cfg, "steps": args.steps, "tol": args.tol,
             "params_global_delta_rel": float(gp_rel),
             "params_worst_value_rel": float(wv_p),
             "ema_global_delta_rel": float(ge_rel),
             "ema_worst_value_rel": float(wv_e),
             "loss_rel_max": float(loss_rel),
             "ema_updates": [ref_updates, our_updates], "ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
