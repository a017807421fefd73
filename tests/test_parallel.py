"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multispectral_object_detection_tpu.parallel.mesh import (
    batch_sharding, make_mesh, param_shardings)


def test_mesh_shapes():
    m = make_mesh(n_data=4, n_model=2)
    assert dict(m.shape) == {"data": 4, "model": 2}
    m2 = make_mesh()
    assert m2.shape["data"] == 8 and m2.shape["model"] == 1


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_2_data_only():
    import __graft_entry__ as g

    g.dryrun_multichip(2)


@pytest.mark.parametrize("n", [3, 5])
def test_dryrun_multichip_odd_counts(n):
    """Odd device counts fall back to data-only meshes with zero idle
    devices (VERDICT r1 weak #8)."""
    import __graft_entry__ as g

    g.dryrun_multichip(n)


def test_data_parallel_matches_single_device():
    """The sharded forward must compute the same math as unsharded."""
    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import yolov5

    model = build_model(yolov5("n", nc=2))
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(1), x)

    ref = model.apply(v, x)

    mesh = make_mesh(n_data=8, n_model=1)
    xs = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def fwd(params, xx):
        return model.apply(params, xx)

    out = fwd(v, xs)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_tensor_parallel_fusion_matches_replicated():
    """TP-sharded CFT forward == replicated forward (same params)."""
    from multispectral_object_detection_tpu.models.fusion import CrossModalFusion

    mod = CrossModalFusion(d_model=64, num_heads=8, n_layer=2)
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 64))
    ir = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 64))
    v = mod.init(jax.random.PRNGKey(2), (rgb, ir), train=False)
    ref = mod.apply(v, (rgb, ir), train=False)

    mesh = make_mesh(n_data=4, n_model=2)
    shards = param_shardings(v["params"], mesh, tensor_parallel=True)
    vp = {"params": jax.tree.map(jax.device_put, v["params"], shards)}
    # at least one kernel must actually be partitioned over 'model'
    specs = jax.tree.leaves(jax.tree.map(lambda s: s.spec, shards,
                                         is_leaf=lambda x: hasattr(x, "spec")))
    assert any("model" in str(s) for s in specs)

    @jax.jit
    def fwd(params, a, b):
        return mod.apply(params, (a, b), train=False)

    out = fwd(vp, jax.device_put(rgb, batch_sharding(mesh)),
              jax.device_put(ir, batch_sharding(mesh)))
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_parallel_eval_forward_matches_single():
    """make_parallel_eval_forward == make_eval_forward, incl. the padded
    short final batch (the --data-parallel path of the test CLI)."""
    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import (
        yolov5_two_stream)
    from multispectral_object_detection_tpu.parallel.mesh import (
        make_parallel_eval_forward)
    from multispectral_object_detection_tpu.train.trainer import (
        make_eval_forward)

    model = build_model(yolov5_two_stream("n", nc=2, fusion="add"))
    rgb = np.random.default_rng(0).integers(
        0, 255, (8, 64, 64, 3), dtype=np.uint8)
    ir = np.random.default_rng(1).integers(
        0, 255, (8, 64, 64, 3), dtype=np.uint8)
    x0 = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(
        jax.random.PRNGKey(2), x0, x0)
    params, stats = v["params"], v.get("batch_stats", {})

    ref_fwd = make_eval_forward(model, two_stream=True)
    ref_dets, ref_feats = ref_fwd(params, stats, rgb, ir)

    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    fwd = make_parallel_eval_forward(model, two_stream=True, mesh=mesh,
                                     batch_size=8)
    p = fwd.place_params(params)
    dets, feats = fwd(p, stats, rgb, ir)
    np.testing.assert_allclose(np.asarray(ref_dets), np.asarray(dets),
                               rtol=1e-5, atol=1e-5)

    # short final batch: padded to 8 internally, sliced back
    dets5, feats5 = fwd(p, stats, rgb[:5], ir[:5])
    assert dets5.shape[0] == 5 and feats5[0].shape[0] == 5
    np.testing.assert_allclose(np.asarray(ref_dets[:5]), np.asarray(dets5),
                               rtol=1e-5, atol=1e-5)


def test_test_cli_data_parallel(tmp_path):
    """--data-parallel N end-to-end through the test CLI (virtual mesh)."""
    import yaml

    from multispectral_object_detection_tpu.cli import test_cli
    from multispectral_object_detection_tpu.data.synthetic import (
        make_paired_dataset)

    rgb, ir = make_paired_dataset(str(tmp_path / "d"), n_images=8,
                                  img_size=96, nc=2, seed=4)
    dy = tmp_path / "data.yaml"
    dy.write_text(yaml.safe_dump({
        "train_rgb": rgb, "train_ir": ir, "val_rgb": rgb, "val_ir": ir,
        "nc": 2, "names": ["a", "b"]}))

    from flax import serialization

    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import get_config

    model = build_model(get_config("yolov5n_fusion_add", nc=2))
    x0 = jnp.zeros((1, 96, 96, 3))
    v = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(
        jax.random.PRNGKey(0), x0, x0)
    ck = tmp_path / "ckpt"
    ck.mkdir()
    (ck / "model.msgpack").write_bytes(serialization.msgpack_serialize(
        {"params": jax.device_get(v["params"]),
         "batch_stats": jax.device_get(v.get("batch_stats", {}))}))

    res_dp = test_cli.main([
        "--cfg", "yolov5n_fusion_add", "--data", str(dy),
        "--weights", str(ck), "--batch-size", "4", "--img-size", "96",
        "--fp32", "--data-parallel", "4", "--no-rect"])
    res_1 = test_cli.main([
        "--cfg", "yolov5n_fusion_add", "--data", str(dy),
        "--weights", str(ck), "--batch-size", "4", "--img-size", "96",
        "--fp32", "--no-rect"])
    assert abs(res_dp["map50"] - res_1["map50"]) < 1e-9


def test_resolve_data_axis():
    """Device-utilization policy (VERDICT r2 item 9): round the batch UP to
    use every device group; shrink the axis only when batch < devices."""
    from multispectral_object_detection_tpu.parallel.mesh import (
        resolve_data_axis)

    assert resolve_data_axis(16, 8) == (8, 16, False)
    assert resolve_data_axis(12, 8) == (8, 16, True)   # the flagged case
    assert resolve_data_axis(4, 8) == (4, 4, False)    # small debug batch
    assert resolve_data_axis(6, 8, n_model=2) == (4, 8, True)
    assert resolve_data_axis(2, 8, n_model=4) == (2, 2, False)
    assert resolve_data_axis(5, 1) == (1, 5, False)


def test_train_cli_rounds_batch_to_devices(tmp_path):
    """batch 12 on the 8-device mesh is rounded up to 16 and trains with a
    full data axis (reference instead asserts, torch_utils.py:83-86)."""
    import yaml

    from multispectral_object_detection_tpu.cli import train_cli
    from multispectral_object_detection_tpu.data.synthetic import (
        make_paired_dataset)

    rgb, ir = make_paired_dataset(str(tmp_path / "d"), n_images=16,
                                  img_size=96, nc=2, seed=6)
    dy = tmp_path / "data.yaml"
    dy.write_text(yaml.safe_dump({
        "train_rgb": rgb, "train_ir": ir, "val_rgb": rgb, "val_ir": ir,
        "nc": 2, "names": ["a", "b"]}))
    train_cli.main([
        "--cfg", "yolov5n_fusion_add", "--data", str(dy),
        "--epochs", "1", "--batch-size", "12", "--img-size", "96",
        "--project", str(tmp_path / "runs"), "--name", "r", "--fp32",
        "--max-labels", "30", "--noautoanchor", "--noval", "--nosave"])
    opt = yaml.safe_load((tmp_path / "runs" / "r" / "opt.yaml").read_text())
    assert opt["batch_size"] == 16


def test_in_train_eval_mesh_matches_single(tmp_path):
    """The in-train eval path (mesh-parallel forward + jitted val loss)
    returns results identical to single-device evaluate (VERDICT r2 item 4),
    including a short final batch."""
    import yaml  # noqa: F401

    from multispectral_object_detection_tpu.data.datasets import (
        BatchLoader, PairedDetectionDataset)
    from multispectral_object_detection_tpu.data.synthetic import (
        make_paired_dataset)
    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import get_config
    from multispectral_object_detection_tpu.models.detect import anchor_arrays
    from multispectral_object_detection_tpu.parallel.mesh import (
        make_parallel_eval_forward)
    from multispectral_object_detection_tpu.train.evaluator import evaluate
    from multispectral_object_detection_tpu.train.loss import DetectionLoss
    from multispectral_object_detection_tpu.train.trainer import (
        make_eval_forward)

    rgb, ir = make_paired_dataset(str(tmp_path / "d"), n_images=6,
                                  img_size=96, nc=2, seed=9)
    model = build_model(get_config("yolov5n_fusion_add", nc=2))
    x0 = jnp.zeros((1, 96, 96, 3))
    v = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(
        jax.random.PRNGKey(0), x0, x0)
    params, stats = v["params"], v.get("batch_stats", {})
    ds = PairedDetectionDataset.from_sources(rgb, ir, img_size=96,
                                             augment=False, nc=2)
    mk_loader = lambda: BatchLoader(ds, 4, shuffle=False, max_labels=30,  # noqa: E731
                                    drop_last=False)
    mk_loss = lambda: DetectionLoss(  # noqa: E731
        nc=2, anchors_px=anchor_arrays(model.spec.anchors),
        strides=model.spec.strides)

    r1 = evaluate(make_eval_forward(model, two_stream=True), params, stats,
                  mk_loader(), nc=2, loss_fn=mk_loss())
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    fwd = mesh_fwd = make_parallel_eval_forward(model, two_stream=True,
                                                mesh=mesh, batch_size=4)
    p = mesh_fwd.place_params(params)
    r8 = evaluate(fwd, p, stats, mk_loader(), nc=2, loss_fn=mk_loss())
    for k in ("mp", "mr", "map50", "map75", "map"):
        np.testing.assert_allclose(r1[k], r8[k], rtol=1e-6, err_msg=k)
    np.testing.assert_allclose(r1["val_loss"], r8["val_loss"], rtol=1e-4)


@pytest.mark.parametrize("remat", ["dots", "full"])
def test_remat_train_step_matches_none(remat):
    """--remat must be a pure memory lever: same grads, same loss (fp32,
    same op order -> numerically equal within float tolerance)."""
    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import (
        yolov5_two_stream)
    from multispectral_object_detection_tpu.models.detect import anchor_arrays
    from multispectral_object_detection_tpu.train.loss import DetectionLoss
    from multispectral_object_detection_tpu.train.optim import (OptHyp,
                                                                build_optimizer)
    from multispectral_object_detection_tpu.train.trainer import (
        create_train_state, make_train_step)

    model = build_model(yolov5_two_stream("n", nc=2, fusion="add"))
    spec = model.spec
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 64, 64, 3), jnp.uint8)
    shapes = jax.eval_shape(model.init, rng, sample.astype(jnp.float32),
                            sample.astype(jnp.float32))
    tx, _ = build_optimizer(shapes["params"], OptHyp(), 10, 3)
    loss_fn = DetectionLoss(nc=2, anchors_px=anchor_arrays(spec.anchors),
                            strides=spec.strides)

    rgb = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3), dtype=np.uint8))
    targets = jnp.tile(jnp.asarray([[0, 0, .5, .5, .25, .25]], jnp.float32),
                       (4, 1))
    tmask = jnp.ones((4,), jnp.float32)

    outs = {}
    for mode in ("none", remat):
        state = create_train_state(model, tx, rng, sample, sample)
        step = make_train_step(model, loss_fn, tx, two_stream=True,
                               donate=False, remat=mode)
        _, m = step(state, rgb, rgb, targets, tmask, jax.random.PRNGKey(1))
        outs[mode] = {k: float(v) for k, v in m.items()}
    for k in outs["none"]:
        np.testing.assert_allclose(outs["none"][k], outs[remat][k],
                                   rtol=1e-5, err_msg=k)
