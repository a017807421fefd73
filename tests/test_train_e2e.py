"""End-to-end smoke: overfit a nano model on synthetic paired data (CPU).

Validates the full wiring: data pipeline -> jitted train step (SGD + warmup +
EMA + BN stats) -> loss decrease -> eval (decode + NMS + matching + mAP).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multispectral_object_detection_tpu.data.datasets import (
    BatchLoader, PairedDetectionDataset)
from multispectral_object_detection_tpu.data.synthetic import make_paired_dataset
from multispectral_object_detection_tpu.models import build_model
from multispectral_object_detection_tpu.models.configs import yolov5_two_stream
from multispectral_object_detection_tpu.models.detect import anchor_arrays
from multispectral_object_detection_tpu.train.evaluator import evaluate
from multispectral_object_detection_tpu.train.loss import DetectionLoss, LossHyp
from multispectral_object_detection_tpu.train.optim import OptHyp, build_optimizer
from multispectral_object_detection_tpu.train.trainer import (
    TrainState, create_train_state, make_eval_forward, make_train_step)

IMG = 128
NC = 2


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rgb_dir, ir_dir = make_paired_dataset(str(root), n_images=8, img_size=IMG,
                                          nc=NC, seed=1)
    cfg = yolov5_two_stream("n", nc=NC, fusion="add")
    model = build_model(cfg)
    spec = model.spec
    # no augmentation: the goal is overfitting 8 fixed images quickly
    ds = PairedDetectionDataset.from_sources(rgb_dir, ir_dir, img_size=IMG,
                                             augment=False, nc=NC)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=0, max_labels=30)

    loss_fn = DetectionLoss(nc=NC, anchors_px=anchor_arrays(spec.anchors),
                            strides=spec.strides, hyp=LossHyp())
    return model, ds, loader, loss_fn, spec


def test_overfit_and_eval(setup):
    model, ds, loader, loss_fn, spec = setup
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((4, IMG, IMG, 3), jnp.uint8)

    variables_shape = jax.eval_shape(
        model.init, rng, sample.astype(jnp.float32),
        sample.astype(jnp.float32))
    tx, roles = build_optimizer(variables_shape["params"],
                                OptHyp(lr0=0.03, warmup_epochs=0.5),
                                steps_per_epoch=2, epochs=80)
    state = create_train_state(model, tx, rng, sample, sample)
    step = make_train_step(model, loss_fn, tx, two_stream=True, donate=False)

    losses = []
    k = jax.random.PRNGKey(1)
    for epoch in range(80):
        for batch in loader:
            k, sk = jax.random.split(k)
            state, metrics = step(state, jnp.asarray(batch["rgb"]),
                                  jnp.asarray(batch["ir"]),
                                  jnp.asarray(batch["targets"]),
                                  jnp.asarray(batch["tmask"]), sk)
            losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    first = np.mean(losses[:4])
    last = np.mean(losses[-4:])
    assert last < 0.7 * first, f"loss did not decrease: {first} -> {last}"

    # BN stats must have moved away from init
    flat = jax.tree.leaves(state.batch_stats)
    assert any(float(jnp.abs(x).max()) > 1e-3 for x in flat)
    # EMA must differ from raw params but stay close
    p0 = jax.tree.leaves(state.params)[0]
    e0 = jax.tree.leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(e0))

    # eval wiring end-to-end (matching + mAP computation)
    eval_ds = PairedDetectionDataset.from_sources(
        ds.rgb_files[0].rsplit("/images", 1)[0] + "/images",
        ds.ir_files[0].rsplit("/images", 1)[0] + "/images",
        img_size=IMG, augment=False, nc=NC)
    eval_loader = BatchLoader(eval_ds, batch_size=4, shuffle=False,
                              max_labels=30, prefetch=False)
    fwd = make_eval_forward(model, two_stream=True)
    out = evaluate(fwd, state.ema_params, state.ema_stats, eval_loader, nc=NC,
                   conf_thres=0.001, iou_thres=0.6)
    assert out["seen"] == 8
    assert np.isfinite(out["map50"])
    # overfit on 8 trivial images must find at least some objects
    assert out["map50"] > 0.05, out


def test_background_checkpoint_roundtrip(tmp_path):
    """background=True saves must be joinable and byte-equivalent to sync
    saves (atomic tmp+rename, one outstanding write)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multispectral_object_detection_tpu.utils import checkpoint as C

    class S:
        params = {"w": jnp.arange(8, dtype=jnp.float32)}
        batch_stats = {"m": jnp.ones((2,))}
        opt_state = ()
        ema_params = {"w": jnp.arange(8, dtype=jnp.float32) * 2}
        ema_stats = {"m": jnp.ones((2,))}
        step = jnp.asarray(7)
        ema_updates = jnp.asarray(3)

    C.save_checkpoint(tmp_path / "a", S(), epoch=1, best_fitness=0.5,
                      background=True)
    C.save_checkpoint(tmp_path / "b", S(), epoch=2, best_fitness=0.6,
                      background=True)
    C.wait_pending()
    raw_a, meta_a = C.load_checkpoint(tmp_path / "a")
    raw_b, meta_b = C.load_checkpoint(tmp_path / "b")
    assert meta_a["epoch"] == 1 and meta_b["epoch"] == 2
    np.testing.assert_array_equal(raw_b["ema_params"]["w"],
                                  np.arange(8, dtype=np.float32) * 2)
    assert not (tmp_path / "a" / "state.msgpack.tmp").exists()
