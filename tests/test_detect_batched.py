"""Batched + headless detect paths must match the batch-1 full path.

Covers detect CLI --batch-size N (N pairs per device dispatch, padded
short final batch) and the --nosave headless fast path (decode straight to
network scale, no full-res materialization, prescale folded into the box
rescale ratio). Both must produce bit-identical label files.
"""

from pathlib import Path

import numpy as np
import pytest
import yaml

from multispectral_object_detection_tpu.data.synthetic import (
    make_paired_dataset)


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("detbatch")
    rgb_dir, ir_dir = make_paired_dataset(str(root / "data"), n_images=8,
                                          img_size=128, nc=2, seed=5)
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import get_config

    model = build_model(get_config("yolov5n_fusion_add", nc=2))
    x0 = jnp.zeros((1, 128, 128, 3))
    v = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(
        jax.random.PRNGKey(0), x0, x0)
    ck = root / "ckpt"
    ck.mkdir()
    (ck / "model.msgpack").write_bytes(serialization.msgpack_serialize(
        {"params": jax.device_get(v["params"]),
         "batch_stats": jax.device_get(v.get("batch_stats", {}))}))
    return root, rgb_dir, ir_dir, str(ck)


def _detect(ws, name, extra):
    root, rgb_dir, ir_dir, ck = ws
    from multispectral_object_detection_tpu.cli.detect_cli import main

    return main([
        "--cfg", "yolov5n_fusion_add", "--weights", ck,
        "--source1", rgb_dir, "--source2", ir_dir, "--img-size", "128",
        "--conf-thres", "1e-5", "--nc", "2", "--fp32", "--save-txt",
        "--project", str(root / "runs"), "--name", name] + extra)


def _labels(root, name):
    out = {}
    for f in sorted((root / "runs" / name / "labels").glob("*.txt")):
        out[f.name] = np.loadtxt(f, ndmin=2)
    return out


def test_batched_and_headless_match_batch1(ws):
    root = ws[0]
    r1 = _detect(ws, "b1", [])
    r3 = _detect(ws, "b3", ["--batch-size", "3"])  # 8 = 3+3+2: pad path
    rh = _detect(ws, "hl", ["--batch-size", "4", "--nosave"])

    assert r1["n_images"] == r3["n_images"] == rh["n_images"] == 8
    assert r1["n_det"] == r3["n_det"] == rh["n_det"]
    assert r1["n_det"] > 0  # random-init fires at conf 1e-5 (obj-bias init)

    l1, l3, lh = (_labels(root, n) for n in ("b1", "b3", "hl"))
    assert set(l1) == set(l3) == set(lh) and len(l1) == 8
    for k in l1:
        # different batch shapes compile different XLA programs (and the
        # headless path reorders the rescale math) -> float-ulp deltas
        # through the %.6g label formatting; 1e-6 normalized units is far
        # below a pixel
        np.testing.assert_allclose(l1[k], l3[k], atol=1e-6)
        np.testing.assert_allclose(l1[k], lh[k], atol=1e-6)
