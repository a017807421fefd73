"""W&B artifact surface (utils/loggers.py) — exercised with a mocked wandb
module (the real package is absent here; reference surface:
utils/wandb_logging/wandb_utils.py:80-306)."""

import sys
import types

import numpy as np
import pytest


class _FakeArtifact:
    def __init__(self, name, type=None, metadata=None):
        self.name, self.type, self.metadata = name, type, metadata
        self.refs, self.dirs, self.aliases = [], [], []

    def add_reference(self, uri, name=None):
        self.refs.append((uri, name))

    def add_dir(self, d):
        self.dirs.append(d)

    def download(self, root=None):
        return str(root)


class _FakeRun:
    def __init__(self):
        self.id = "fake123"
        self.logged = []
        self.artifacts = []

    def log(self, payload, step=None):
        self.logged.append((payload, step))

    def log_artifact(self, art, aliases=None):
        art.aliases = aliases or []
        self.artifacts.append(art)

    def use_artifact(self, path):
        return _FakeArtifact(path)

    def finish(self):
        pass


@pytest.fixture
def fake_wandb(monkeypatch):
    run = _FakeRun()
    mod = types.ModuleType("wandb")
    mod.init = lambda **k: run
    mod.Artifact = _FakeArtifact
    mod.Image = lambda img, boxes=None: ("image", np.asarray(img).shape,
                                         boxes)
    mod.Api = lambda: types.SimpleNamespace(
        artifact=lambda p: _FakeArtifact(p))
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return run


def test_test_cli_wandb_panels(tmp_path, fake_wandb):
    """test.py --wandb logs metrics + bbox-debug panels of the val images
    (reference test.py:160-170)."""
    import yaml

    from multispectral_object_detection_tpu.data.synthetic import (
        make_paired_dataset)

    rgb, ir = make_paired_dataset(str(tmp_path / "d"), n_images=8,
                                  img_size=128, nc=2, seed=5)
    data_yaml = tmp_path / "d.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "train_rgb": rgb, "train_ir": ir, "val_rgb": rgb, "val_ir": ir,
        "nc": 2, "names": ["red", "blue"]}))
    # random-init stripped checkpoint (panels need detections, not quality —
    # eval runs at conf 0.001 so an untrained net still emits candidates)
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import get_config

    model = build_model(get_config("yolov5n_fusion_add", nc=2),
                        dtype=jnp.float32)
    z = jnp.zeros((1, 128, 128, 3))
    v = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(
        jax.random.PRNGKey(0), z, z)
    ck = tmp_path / "ck"
    ck.mkdir()
    (ck / "model.msgpack").write_bytes(serialization.to_bytes(
        {"params": v["params"], "batch_stats": v.get("batch_stats", {})}))

    from multispectral_object_detection_tpu.cli.test_cli import main as tmain

    res = tmain(["--cfg", "yolov5n_fusion_add", "--data", str(data_yaml),
                 "--weights", str(ck),
                 "--batch-size", "4", "--img-size", "128", "--fp32",
                 "--wandb", "--project", str(tmp_path / "rt"), "--name", "w"])
    assert np.isfinite(res["map50"])
    keys = [k for p, _ in fake_wandb.logged for k in p]
    assert "Bounding Box Debugger/Images" in keys
    assert "metrics/mAP_0.5" in keys


def test_noop_without_wandb(tmp_path):
    from multispectral_object_detection_tpu.utils.loggers import (
        ExperimentLogger)

    x = ExperimentLogger(str(tmp_path), enable_tb=False, enable_wandb=False)
    assert x.log_dataset_artifact({"nc": 2}) is None
    assert x.log_model(tmp_path, 0, 0.1) is None
    x.log_bbox_debug_images([], [], [])  # no-op
    assert x.resume_from_artifact("runs/x", tmp_path) is None  # not an URI
    x.close()


def test_artifact_surface_with_mock(tmp_path, fake_wandb):
    from multispectral_object_detection_tpu.utils.loggers import (
        ExperimentLogger)

    x = ExperimentLogger(str(tmp_path), enable_tb=False, enable_wandb=True,
                         config={"epochs": 3}, run_name="t")
    assert x.wandb_run is fake_wandb

    # dataset artifact with directory references
    d = tmp_path / "imgs"
    d.mkdir()
    art = x.log_dataset_artifact(
        {"train_rgb": str(d), "nc": 2, "names": ["a", "b"]}, name="synth")
    assert art.type == "dataset"
    assert art.refs and art.refs[0][1] == "train_rgb"
    assert art.metadata["nc"] == 2

    # model artifact: save_period gating + aliases
    ck = tmp_path / "epoch4"
    ck.mkdir()
    assert x.log_model(ck, epoch=3, fitness=0.5, save_period=2) is None
    art = x.log_model(ck, epoch=4, fitness=0.6, best=True, save_period=2)
    assert art.dirs == [str(ck)]
    assert "best" in art.aliases and "latest" in art.aliases

    # bbox debug panels
    img = np.zeros((8, 8, 3), np.uint8)
    dets = [(np.asarray([[0, 0, 4, 4.0]]), np.asarray([0.9]),
             np.asarray([1]))]
    x.log_bbox_debug_images([img], dets, ["a", "b"])
    payload, _ = fake_wandb.logged[-1]
    panels = payload["Bounding Box Debugger/Images"]
    assert len(panels) == 1
    bd = panels[0][2]["predictions"]["box_data"][0]
    assert bd["box_caption"].startswith("b 0.9")

    # resume from artifact URI
    out = x.resume_from_artifact("wandb-artifact://entity/proj/run_model",
                                 tmp_path / "dl")
    assert out == str(tmp_path / "dl")

    # scalar logging still flows to the run
    x.log_epoch(1, [0.1, 0.2, 0.3], {"mp": 0.5, "mr": 0.6, "map50": 0.7,
                                     "map75": 0.4, "map": 0.3})
    assert any("metrics/mAP_0.5" in p for p, _ in fake_wandb.logged)
    x.close()
