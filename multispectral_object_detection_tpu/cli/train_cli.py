"""Training driver — the `train_rgb_ir` of the reference (train.py:472-911).

Single program, any number of chips: the global batch is sharded over the
mesh's 'data' axis (replacing DP/DDP/SyncBN, SURVEY.md §2.8); the train step
is one jitted function (forward bf16, loss, grads, SGD+EMA). Per-epoch eval
uses the EMA weights and the reference protocol; `last`/`best` checkpoints
are pure pytrees.
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import numpy as np
import yaml

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    ap = argparse.ArgumentParser("train")
    ap.add_argument("--cfg", type=str, default="yolov5l_fusion_transformerx3",
                    help="model name (configs.get_config) or model YAML path")
    ap.add_argument("--data", type=str, required=True,
                    help="dataset YAML: {train_rgb, train_ir, val_rgb, val_ir,"
                         " nc, names} or single-stream {train, val, nc, names}")
    ap.add_argument("--hyp", type=str, default="scratch")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--img-size", type=int, nargs="+", default=[640],
                    help="[train, val] image sizes (train.py:928; one value "
                         "uses it for both)")
    ap.add_argument("--weights", type=str, default="",
                    help="checkpoint dir to warm-start from")
    ap.add_argument("--resume", nargs="?", const=True, default="",
                    help="checkpoint dir to resume (restores optimizer/"
                         "epoch); bare --resume auto-locates the most "
                         "recent run's last checkpoint (train.py:969-977 "
                         "via get_latest_run, general.py:48-51)")
    ap.add_argument("--project", type=str, default="runs/train")
    ap.add_argument("--name", type=str, default="exp")
    ap.add_argument("--exist-ok", action="store_true")
    ap.add_argument("--adam", action="store_true")
    ap.add_argument("--linear-lr", action="store_true")
    ap.add_argument("--remat", type=str, default="none",
                    choices=["none", "dots", "full", "blocks"],
                    help="activation rematerialization: trade recompute "
                         "for HBM (larger batch/resolution); 'dots' saves "
                         "matmul outputs, 'full' recomputes the whole "
                         "forward in the backward pass, 'blocks' "
                         "checkpoints each graph node (keeps boundary "
                         "activations, recomputes intra-block temporaries). "
                         "Measured flagship @640 (PERF.md round 4): "
                         "'blocks' is 13%% FASTER at batch<=8 (recompute "
                         "beats activation HBM round-trips) and 2.4x "
                         "leaner; at batch 16 'none' wins")
    ap.add_argument("--label-smoothing", type=float, default=0.0)
    ap.add_argument("--single-cls", action="store_true")
    ap.add_argument("--noval", "--notest", action="store_true",
                    help="skip per-epoch eval (reference spells it --notest,"
                         " train.py:936)")
    ap.add_argument("--nosave", action="store_true")
    ap.add_argument("--max-labels", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=1)
    ap.add_argument("--save-period", "--save_period", type=int, default=-1)
    ap.add_argument("--ckpt-every", type=int, default=1,
                    help="save the rolling 'last' checkpoint every N epochs "
                         "(host serialization is expensive on small VMs)")
    ap.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    ap.add_argument("--n-model", type=int, default=1,
                    help="tensor-parallel axis size for the CFT blocks")
    ap.add_argument("--evolve", type=int, default=0, metavar="N",
                    help="evolve hyperparameters for N generations")
    ap.add_argument("--noautoanchor", action="store_true",
                    help="skip the anchor BPR audit / re-clustering")
    ap.add_argument("--cache-images", action="store_true",
                    help="cache decoded+scaled images in RAM (datasets.py:619)")
    ap.add_argument("--device-aug", action="store_true",
                    help="run mosaic/scale/translate/flip/HSV on the TPU "
                         "(ops/augment_device.py); host only decodes + "
                         "letterboxes tiles. Requires default-family affine "
                         "hyps (degrees/shear/perspective = 0)")
    ap.add_argument("--compute-val-loss", action="store_true",
                    help="also report box/obj/cls loss on the val split "
                         "(test.py:122-123)")
    ap.add_argument("--rect", action="store_true",
                    help="rectangular training: aspect-bucketed batches, "
                         "mosaic off (train.py:930)")
    ap.add_argument("--image-weights", action="store_true",
                    help="class-frequency-weighted image resampling per "
                         "epoch (train.py:690-699)")
    ap.add_argument("--wandb", action="store_true",
                    help="enable W&B logging (no-op if not installed)")
    ap.add_argument("--upload-dataset", "--upload_dataset",
                    action="store_true",
                    help="log the dataset as a W&B artifact "
                         "(wandb_utils.py:166)")
    ap.add_argument("--entity", type=str, default=None,
                    help="W&B entity (train.py:948)")
    ap.add_argument("--bbox-interval", "--bbox_interval", type=int,
                    default=-1,
                    help="log W&B bbox-debug panels of the val set every N "
                         "epochs (train.py:951, test.py:160-170); -1 = off")
    ap.add_argument("--quad", action="store_true",
                    help="quad dataloader (train.py:945): each 4 samples "
                         "become one 2x-canvas training image (stitched "
                         "2x2 or one tile upsampled 2x, p=0.5), loss x4 — "
                         "small-object training at 2x receptive scale for "
                         "the memory of a quarter batch. The upstream "
                         "collate_fn4 crashes on a leftover debug print; "
                         "this one works (data/datasets.py:collate_quad)")
    ap.add_argument("--multi-scale", action="store_true",
                    help="vary train image size +/-50%% per batch over a "
                         "stride-64 ladder (train.py:747; each size is one "
                         "cached XLA program)")
    ap.add_argument("--freeze", type=str, nargs="*", default=None,
                    help="freeze parameters whose path contains any of "
                         "these substrings (reference train.py:535-540 "
                         "freeze loop, hardcoded empty upstream; e.g. "
                         "--freeze stream1_ stream2_ freezes both "
                         "backbones for fusion-only fine-tuning)")
    # ---- reference-compat flags (drop-in CLI surface, train.py:924-957) ----
    ap.add_argument("--device", type=str, default="",
                    help="'cpu' forces the CPU platform; CUDA-style indices "
                         "are a no-op on TPU (mesh owns placement)")
    ap.add_argument("--sync-bn", action="store_true",
                    help="accepted for compatibility (train.py:942) — BN "
                         "statistics are global-batch by construction in "
                         "the single-program mesh (parallel/mesh.py), so "
                         "SyncBN is always on")
    ap.add_argument("--workers", type=int, default=8,
                    help="accepted for compatibility (train.py:946); the "
                         "host pipeline is a fixed 2-deep prefetch thread "
                         "sized for single-core hosts (data/datasets.py:"
                         "BatchLoader)")
    ap.add_argument("--bucket", type=str, default="",
                    help="gsutil upload bucket (train.py:931) — unsupported "
                         "in this zero-egress build; noted and skipped")
    ap.add_argument("--artifact-alias", "--artifact_alias", type=str,
                    default="latest",
                    help="accepted for compatibility (train.py:956); dataset "
                         "artifact versioning rides --upload-dataset")
    ap.add_argument("--local_rank", type=int, default=-1,
                    help="accepted for compatibility (train.py:943); the "
                         "DDP launcher is replaced by one mesh program — "
                         "no per-rank processes to index")
    return ap.parse_args(argv)


def load_data_cfg(path: str) -> dict:
    with open(path) as f:
        d = yaml.safe_load(f)
    return d


def run(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ..data.datasets import BatchLoader, PairedDetectionDataset
    from ..data.hyps import load_hyp
    from ..models import build_model
    from ..models.configs import get_config
    from ..models.detect import anchor_arrays
    from ..parallel.mesh import (batch_sharding, make_mesh,
                                 make_parallel_eval_forward,
                                 make_parallel_train_step, param_shardings,
                                 resolve_data_axis, shard_state)
    from ..train.evaluator import evaluate
    from ..train.loss import DetectionLoss, LossHyp, scale_gains
    from ..train.optim import OptHyp, build_optimizer
    from ..train.trainer import create_train_state
    from ..utils.checkpoint import (load_checkpoint, save_checkpoint,
                                    strip_checkpoint, wait_pending)
    from ..utils.general import (check_dataset, check_file, check_img_size,
                                 increment_path, init_seeds, set_logging)
    from ..utils.metrics import fitness

    set_logging()
    from ..utils.general import apply_device_arg, enable_compilation_cache
    apply_device_arg(getattr(args, "device", ""))
    enable_compilation_cache()
    if getattr(args, "sync_bn", False):
        logger.info("--sync-bn: always on — BN stats are global-batch by "
                    "construction on the mesh (parallel/mesh.py)")
    if getattr(args, "bucket", ""):
        logger.info(f"--bucket {args.bucket}: gsutil upload unsupported "
                    "(zero-egress build); checkpoints stay local")
    init_seeds(args.seed)
    save_dir = increment_path(Path(args.project) / args.name,
                              exist_ok=args.exist_ok)
    save_dir.mkdir(parents=True, exist_ok=True)
    logger.info(f"run dir: {save_dir}")

    args.data = check_file(args.data)  # recursive search (general.py:152)
    if str(args.cfg).endswith((".yaml", ".yml")):
        args.cfg = check_file(args.cfg)
    data = load_data_cfg(args.data)
    check_dataset(data)  # verify val paths / attempt autodownload recipe
    nc = 1 if args.single_cls else int(data["nc"])
    two_stream = "train_ir" in data
    sizes = (args.img_size if isinstance(args.img_size, (list, tuple))
             else [args.img_size])
    img_size = check_img_size(sizes[0], 32)
    val_img_size = check_img_size(sizes[-1], 32)
    # device-utilization guard: use every device group; round the batch up
    # to a multiple rather than silently idling chips (the reference asserts
    # divisibility instead, utils/torch_utils.py:83-86)
    if args.quad:
        assert not args.device_aug and not args.rect, \
            "--quad is exclusive with --device-aug/--rect"
        if args.batch_size % 4:
            args.batch_size = ((args.batch_size + 3) // 4) * 4
            logger.warning(f"--quad: batch rounded up to {args.batch_size}")
        # the train step sees the CANVAS batch (bs/4) — shard on that
        n_data, new_cbs, changed = resolve_data_axis(
            args.batch_size // 4, len(jax.devices()), args.n_model)
        if changed:
            args.batch_size = new_cbs * 4
            logger.warning(
                f"--quad: canvas batch not divisible by the {n_data}-way "
                f"data axis; batch rounded up to {args.batch_size}")
    else:
        n_data, new_bs, changed = resolve_data_axis(
            args.batch_size, len(jax.devices()), args.n_model)
        if changed:
            logger.warning(
                f"--batch-size {args.batch_size} is not divisible by the "
                f"{n_data}-way data axis; rounding up to {new_bs} so no "
                f"device idles")
            args.batch_size = new_bs
    avail_groups = len(jax.devices()) // max(args.n_model, 1)
    if n_data < avail_groups:
        logger.warning(f"batch {args.batch_size} limits data axis to "
                       f"{n_data} of {avail_groups} available device groups")
    hyp = load_hyp(args.hyp)
    hyp["label_smoothing"] = args.label_smoothing
    (save_dir / "hyp.yaml").write_text(yaml.safe_dump(hyp))
    (save_dir / "opt.yaml").write_text(yaml.safe_dump(vars(args)))

    # ---- data --------------------------------------------------------------
    train_ds = PairedDetectionDataset.from_sources(
        data["train_rgb"] if two_stream else data["train"],
        data.get("train_ir"), img_size=img_size, augment=True, hyp=hyp,
        nc=nc if not args.single_cls else None, rect=args.rect,
        cache_dir=str(save_dir / "cache"), cache_images=args.cache_images)

    # ---- model -------------------------------------------------------------
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    cfg = args.cfg if args.cfg.endswith((".yaml", ".yml")) else \
        get_config(args.cfg, nc=nc)
    anchors_override = None
    if not args.noautoanchor:
        # BPR audit + optional re-cluster on the train labels (train.py:652)
        import numpy as _np

        from ..models.parser import parse_model_config
        from ..utils.autoanchor import check_anchors

        spec0 = parse_model_config(cfg, nc=nc)
        anc0 = _np.asarray(spec0.anchors, dtype=_np.float32).reshape(
            spec0.nl, -1, 2)
        anc1 = check_anchors(train_ds.labels, anc0, img_size,
                             thr=hyp["anchor_t"])
        if not _np.allclose(anc0, anc1):
            anchors_override = [[float(v) for v in a.reshape(-1)]
                                for a in anc1]
            logger.info("autoanchor: anchors updated")
    model = build_model(cfg, nc=nc, dtype=dtype, anchors=anchors_override,
                        remat_blocks=args.remat == "blocks")
    spec = model.spec
    assert spec.two_stream == two_stream, (
        f"model two_stream={spec.two_stream} but dataset "
        f"{'has' if two_stream else 'lacks'} an IR split")
    if args.single_cls:
        for l in train_ds.labels:
            if len(l):
                l[:, 0] = 0
    if args.device_aug:
        assert hyp.get("degrees", 0) == 0 and hyp.get("shear", 0) == 0 \
            and hyp.get("perspective", 0) == 0, \
            "--device-aug supports the separable (scale/translate) affine only"
    loader = BatchLoader(train_ds, args.batch_size, shuffle=True,
                         seed=args.seed, max_labels=args.max_labels,
                         image_weights=args.image_weights,
                         device_aug=args.device_aug, quad=args.quad,
                         max_labels_per_tile=max(args.max_labels // 4, 10))
    steps_per_epoch = len(loader)
    assert steps_per_epoch > 0, "dataset smaller than one batch"

    val_loader = None
    if not args.noval:
        val_ds = PairedDetectionDataset.from_sources(
            data["val_rgb"] if two_stream else data["val"],
            data.get("val_ir"), img_size=val_img_size, augment=False,
            nc=nc if not args.single_cls else None,
            cache_dir=str(save_dir / "cache"))
        if args.single_cls:
            for l in val_ds.labels:
                if len(l):
                    l[:, 0] = 0
        val_loader = BatchLoader(val_ds, args.batch_size, shuffle=False,
                                 max_labels=args.max_labels, drop_last=False)

    # ---- optimizer / state ---------------------------------------------------
    accumulate = max(round(64 / args.batch_size), 1)  # train.py:543
    ohyp = OptHyp(lr0=hyp["lr0"], lrf=hyp["lrf"], momentum=hyp["momentum"],
                  weight_decay=hyp["weight_decay"],
                  warmup_epochs=hyp["warmup_epochs"],
                  warmup_momentum=hyp["warmup_momentum"],
                  warmup_bias_lr=hyp["warmup_bias_lr"], adam=args.adam)
    lhyp = LossHyp(box=hyp["box"], obj=hyp["obj"], cls=hyp["cls"],
                   cls_pw=hyp["cls_pw"], obj_pw=hyp["obj_pw"],
                   anchor_t=hyp["anchor_t"], fl_gamma=hyp["fl_gamma"],
                   label_smoothing=hyp["label_smoothing"])
    # scale gains to layers/classes/image size (reference train.py:661-663)
    lhyp = scale_gains(lhyp, nc=nc, img_size=img_size,
                       nl=len(spec.strides))
    loss_fn = DetectionLoss(nc=nc, anchors_px=anchor_arrays(spec.anchors),
                            strides=spec.strides, hyp=lhyp,
                            loss_mult=4.0 if args.quad else 1.0)
    # val batches are never quadded — their loss keeps the x1 scale
    val_loss_fn = loss_fn if not args.quad else DetectionLoss(
        nc=nc, anchors_px=anchor_arrays(spec.anchors),
        strides=spec.strides, hyp=lhyp)

    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((args.batch_size, img_size, img_size, 3), jnp.uint8)
    shapes = jax.eval_shape(
        model.init, rng, sample.astype(jnp.float32),
        *([] if not two_stream else [sample.astype(jnp.float32)]))
    tx, roles = build_optimizer(shapes["params"], ohyp, steps_per_epoch,
                                args.epochs, accumulate, args.batch_size,
                                linear_lr=args.linear_lr,
                                freeze=tuple(args.freeze or ()))
    if args.freeze:
        n_frozen = sum(int(s.size) for s, r in zip(
            jax.tree.leaves(shapes["params"]), jax.tree.leaves(roles))
            if r == "frozen")
        logger.info(f"--freeze {args.freeze}: {n_frozen:,} params frozen")

    state = create_train_state(model, tx, rng, sample,
                               sample if two_stream else None)
    n_par = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info(f"model: {len(spec.nodes)} layers, {n_par:,} params, "
                f"accumulate={accumulate}")

    start_epoch, best_fitness = 0, 0.0
    if args.resume is True:
        # bare --resume: find the newest run's last checkpoint
        # (train.py:969-977 -> get_latest_run, general.py:48-51)
        from ..utils.general import get_latest_run

        found = get_latest_run(args.project) or get_latest_run("runs")
        if not found:
            raise SystemExit(
                f"--resume: no 'last' checkpoint found under "
                f"{args.project} or runs/")
        args.resume = found
        logger.info(f"--resume: auto-located {found}")
    if str(args.resume).startswith("wandb-artifact://"):
        # resume-from-artifact (wandb_utils.py:110-135)
        local = xlog_resume = None
        from ..utils.loggers import ExperimentLogger as _EL

        xlog_resume = _EL(str(save_dir), enable_tb=False,
                          enable_wandb=True, run_name=args.name)
        local = xlog_resume.resume_from_artifact(
            args.resume, str(save_dir / "artifact"))
        if local is None:
            raise RuntimeError(f"could not fetch artifact {args.resume}")
        args.resume = local
    if args.resume:
        state, meta = load_checkpoint(args.resume, state)
        start_epoch = meta.get("epoch", -1) + 1
        best_fitness = meta.get("best_fitness", 0.0)
        logger.info(f"resumed from {args.resume} at epoch {start_epoch}")
    elif args.weights:
        # shape-matched partial transfer (intersect_dicts semantics,
        # train.py:517-523): nc/anchor mismatches keep fresh heads
        from ..utils.checkpoint import load_checkpoint as _lc
        from ..utils.checkpoint import partial_load

        raw, _ = _lc(args.weights)
        new_params, n_c, n_t = partial_load(state.params,
                                            raw.get("params", {}))
        new_stats, _, _ = partial_load(state.batch_stats,
                                       raw.get("batch_stats", {}))
        state = state.replace(params=new_params, batch_stats=new_stats)
        logger.info(f"warm-start: transferred {n_c}/{n_t} tensors "
                    f"from {args.weights}")

    # ---- mesh / sharding ------------------------------------------------------
    mesh = make_mesh(n_data=n_data, n_model=args.n_model)
    pshard = param_shardings(state.params, mesh,
                             tensor_parallel=args.n_model > 1)
    state = shard_state(state, pshard, mesh)
    step = make_parallel_train_step(model, loss_fn, tx,
                                    two_stream=two_stream, mesh=mesh,
                                    tensor_parallel=args.n_model > 1,
                                    # 'blocks' lives inside the model
                                    # (DetectionModel.remat_blocks), not as
                                    # a loss-closure wrap
                                    remat="none" if args.remat == "blocks"
                                    else args.remat)
    data_shard = batch_sharding(mesh)
    # in-train eval over the SAME mesh: per-epoch eval scales with the data
    # axis instead of serializing on one chip (the reference evaluates on
    # rank 0 only, train.py:805)
    fwd = make_parallel_eval_forward(model, two_stream=two_stream, mesh=mesh,
                                     batch_size=args.batch_size)
    # device-side per-step metric accumulation: fetching scalars every step
    # is 4 host round trips/step over the axon tunnel (PERF.md rule:
    # fetch per epoch, never per step)
    @jax.jit
    def _acc_metrics(acc, m):
        return acc + jnp.stack([m["box"], m["obj"], m["cls"], m["total"]])

    # ---- observability --------------------------------------------------------
    from ..utils.loggers import ExperimentLogger
    from ..utils.plots import (plot_batch, plot_label_correlogram,
                               plot_labels, plot_lr_schedule, plot_results)

    xlog = ExperimentLogger(str(save_dir), enable_tb=not args.nosave,
                            enable_wandb=args.wandb, config=vars(args),
                            run_name=args.name, entity=args.entity)
    if args.upload_dataset:
        xlog.log_dataset_artifact(data, name=Path(args.data).stem)
    if not args.nosave:
        try:
            plot_labels(train_ds.labels, data.get("names", []), str(save_dir))
            plot_label_correlogram(train_ds.labels, str(save_dir))
            # simulated LR trajectory (reference plots.py:206-220)
            plot_lr_schedule(ohyp, steps_per_epoch, args.epochs,
                             args.batch_size, str(save_dir),
                             linear_lr=args.linear_lr)
        except Exception as e:
            logger.warning(f"label plot failed: {e}")

    # multi-scale ladder: 0.5x-1.5x in 64px steps (stride-safe), each size a
    # cached compilation of the same train step
    import random as _random

    ms_rng = _random.Random(args.seed + 7)
    if args.multi_scale:
        lo = max(64, (int(img_size * 0.5) // 64) * 64)
        hi = (int(img_size * 1.5) // 64) * 64
        ms_ladder = list(range(lo, hi + 1, 64))
        from ..ops.attention import _bilinear_matrix

        @jax.jit
        def _resize_u8(imgs, av, ah):
            x = imgs.astype(jnp.float32)
            x = jnp.einsum("oh,bhwc->bowc", av, x)
            x = jnp.einsum("ow,bhwc->bhoc", ah, x)
            return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)

        def ms_resize(arr, sz):
            if sz == arr.shape[1]:
                return arr
            av = jnp.asarray(_bilinear_matrix(arr.shape[1], sz))
            ah = jnp.asarray(_bilinear_matrix(arr.shape[2], sz))
            return _resize_u8(jnp.asarray(arr), av, ah)

    results_file = save_dir / "results.txt"
    key = jax.random.PRNGKey(args.seed + 1)
    final = {}
    plotted = 0
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        agg_dev = jnp.zeros((4,), jnp.float32)  # on-device running sums
        nb = 0
        for batch in loader:
            key, sk = jax.random.split(key)
            if args.device_aug:
                from ..ops.augment_device import device_mosaic_batch

                key, ak = jax.random.split(key)
                rgb_d, ir_d, tg, tm = device_mosaic_batch(
                    jnp.asarray(batch["tiles_rgb"]),
                    jnp.asarray(batch["tiles_ir"]),
                    jnp.asarray(batch["tile_labels"]),
                    jnp.asarray(batch["tile_lmask"]), ak,
                    img_size=img_size, scale_jit=hyp["scale"],
                    translate=hyp["translate"], fliplr=hyp["fliplr"],
                    hsv_gains=(hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"]))
                Bq, Mq = tm.shape
                idx = jnp.broadcast_to(
                    jnp.arange(Bq, dtype=jnp.float32)[:, None, None],
                    (Bq, Mq, 1))
                targets_d = jnp.concatenate([idx, tg], -1).reshape(Bq * Mq, 6)
                tmask_d = tm.reshape(-1)
                rgb = jax.device_put(rgb_d, data_shard)
                ir = jax.device_put(ir_d, data_shard)
                state, m = step(state, rgb, ir, targets_d, tmask_d, sk)
                agg_dev = _acc_metrics(agg_dev, m)
                nb += 1
                if plotted < 3 and not args.nosave:
                    # train_batch*.jpg on the device-aug path too (the
                    # reference plots its first 3 batches unconditionally,
                    # train.py:719-732); one-off host fetch of the mosaic
                    plot_batch(np.asarray(rgb_d), np.asarray(targets_d),
                               np.asarray(tmask_d),
                               str(save_dir / f"train_batch{plotted}.jpg"),
                               data.get("names"))
                    plotted += 1
                continue
            if plotted < 3 and not args.nosave:
                plot_batch(batch["rgb"], batch["targets"], batch["tmask"],
                           str(save_dir / f"train_batch{plotted}.jpg"),
                           data.get("names"))
                plotted += 1
            rgb_np = batch["rgb"]
            ir_np = batch.get("ir", batch["rgb"])
            if args.multi_scale:
                sz = ms_rng.choice(ms_ladder)
                rgb_np = ms_resize(rgb_np, sz)
                ir_np = ms_resize(ir_np, sz)
            rgb = jax.device_put(rgb_np, data_shard)
            ir = jax.device_put(ir_np, data_shard)
            state, m = step(state, rgb, ir, jnp.asarray(batch["targets"]),
                            jnp.asarray(batch["tmask"]), sk)
            agg_dev = _acc_metrics(agg_dev, m)
            nb += 1
        # ONE device->host fetch per epoch
        agg = np.asarray(jax.device_get(agg_dev)) / max(nb, 1)
        line = (f"epoch {epoch}/{args.epochs - 1} "
                f"box {agg[0]:.4f} obj {agg[1]:.4f} cls {agg[2]:.4f} "
                f"total {agg[3]:.4f} ({time.time() - t0:.1f}s)")

        fi = 0.0
        if val_loader is not None and (epoch % args.eval_every == 0
                                       or epoch == args.epochs - 1):
            # W&B bbox-debug panels every --bbox-interval epochs
            # (train.py:951 -> test.py:160-170)
            panels = []
            pi_hook = None
            if (xlog.wandb_run is not None and args.bbox_interval > 0
                    and epoch % args.bbox_interval == 0):
                def pi_hook(idx, boxes, scores, classes, native_hw):
                    if len(panels) < 16 and idx < len(val_ds.rgb_files):
                        import cv2 as _cv2

                        im = _cv2.imread(val_ds.rgb_files[idx])
                        if im is not None:
                            panels.append((im[:, :, ::-1],
                                           (boxes, scores, classes)))
            res = evaluate(fwd, state.ema_params, state.ema_stats, val_loader,
                           nc=nc, conf_thres=0.001, iou_thres=0.6,
                           single_cls=args.single_cls, per_image=pi_hook,
                           loss_fn=val_loss_fn if args.compute_val_loss
                           else None)
            if panels:
                xlog.log_bbox_debug_images(
                    [p[0] for p in panels], [p[1] for p in panels],
                    data.get("names", [str(i) for i in range(nc)]))
            fi = fitness(res["mp"], res["mr"], res["map50"], res["map"])
            line += (f" | P {res['mp']:.3f} R {res['mr']:.3f} "
                     f"mAP50 {res['map50']:.3f} mAP75 {res['map75']:.3f} "
                     f"mAP {res['map']:.3f}")
            final = res
        logger.info(line)
        with open(results_file, "a") as f:
            f.write(line + "\n")
        xlog.log_epoch(epoch, agg[:3], final if fi else {})

        if not args.nosave:
            if (epoch % max(args.ckpt_every, 1) == 0
                    or epoch == args.epochs - 1):
                save_checkpoint(save_dir / "last", state, epoch=epoch,
                                best_fitness=max(best_fitness, fi),
                                background=True)
            if fi > best_fitness:
                best_fitness = fi
                save_checkpoint(save_dir / "best", state, epoch=epoch,
                                best_fitness=best_fitness,
                                background=True)
            if args.save_period > 0 and epoch % args.save_period == 0:
                save_checkpoint(save_dir / f"epoch{epoch}", state, epoch=epoch,
                                best_fitness=best_fitness)
                # (synchronous: log_model reads the files right back)
                # model artifact per save_period (wandb_utils.py:203-215)
                xlog.log_model(save_dir / f"epoch{epoch}", epoch, fi,
                               best=fi >= best_fitness,
                               save_period=args.save_period)

    xlog.close()
    wait_pending()  # background checkpoint writes must land before strip
    if not args.nosave:
        for tag in ("last", "best"):
            if (save_dir / tag / "state.msgpack").exists():
                strip_checkpoint(save_dir / tag)
        try:
            plot_results(str(results_file), str(save_dir / "results.png"))
        except Exception as e:
            logger.warning(f"results plot failed: {e}")
    (save_dir / "final.json").write_text(json.dumps(
        {k: v for k, v in final.items() if isinstance(v, (int, float))},
        indent=1))
    return final


def evolve(args) -> dict:
    """Genetic hyperparameter evolution (reference train.py:1016-1094):
    single-parent mutation (80% prob, 20% sigma) from a fitness-weighted
    parent pool, bounds from EVOLVE_META, results appended to evolve.txt."""
    import numpy as np

    from ..data.hyps import EVOLVE_META, load_hyp
    from ..utils.metrics import fitness as fitness_fn

    base_dir = Path(args.project) / f"{args.name}_evolve"
    base_dir.mkdir(parents=True, exist_ok=True)
    evolve_file = base_dir / "evolve.txt"
    hyp = load_hyp(args.hyp)
    rng = np.random.default_rng(args.seed)
    keys = [k for k in EVOLVE_META if k in hyp]

    best = None
    for gen in range(args.evolve):
        if evolve_file.exists() and evolve_file.stat().st_size:
            rows = np.atleast_2d(np.loadtxt(evolve_file))
            n = min(5, len(rows))
            top = rows[np.argsort(-rows[:, 0])][:n]
            w = top[:, 0] - top[:, 0].min() + 1e-6
            parent = top[rng.choice(n, p=w / w.sum())]
            # mutate (train.py:1057-1067)
            for _ in range(100):
                v = np.ones(len(keys))
                while all(v == 1):
                    g = np.array([EVOLVE_META[k][0] for k in keys])
                    v = (g * (rng.random(len(keys)) < 0.8) *
                         rng.standard_normal(len(keys)) * rng.random() * 0.2
                         + 1).clip(0.3, 3.0)
                if not all(v == 1):
                    break
            for i, k in enumerate(keys):
                hyp[k] = float(parent[i + 1] * v[i])
        for k in keys:  # clip to bounds
            hyp[k] = float(np.clip(hyp[k], EVOLVE_META[k][1], EVOLVE_META[k][2]))

        sub = argparse.Namespace(**vars(args))
        sub.hyp = dict(hyp)
        sub.evolve = 0
        sub.name = f"{args.name}_evolve/gen{gen}"
        sub.nosave = True
        sub.exist_ok = True
        res = run(sub)
        fi = fitness_fn(res.get("mp", 0), res.get("mr", 0),
                        res.get("map50", 0), res.get("map", 0))
        with open(evolve_file, "a") as f:
            f.write(" ".join([f"{fi:.6f}"] + [f"{hyp[k]:.6g}" for k in keys])
                    + "\n")
        logger.info(f"evolve gen {gen}: fitness {fi:.4f}")
        if best is None or fi > best[0]:
            best = (fi, dict(hyp))
            (base_dir / "hyp_evolved.yaml").write_text(yaml.safe_dump(hyp))
    if evolve_file.exists() and evolve_file.stat().st_size:
        try:  # fitness-vs-hyp scatter grid (reference plots.py:333-358)
            from ..utils.plots import plot_evolution

            plot_evolution(str(evolve_file), keys,
                           str(base_dir / "evolve.png"))
        except Exception as e:
            logger.warning(f"evolve plot failed: {e}")
    return {"best_fitness": best[0] if best else 0.0,
            "hyp": best[1] if best else hyp}


def main(argv=None):
    args = parse_args(argv)
    if args.evolve > 0:
        return evolve(args)
    return run(args)


if __name__ == "__main__":
    main()
