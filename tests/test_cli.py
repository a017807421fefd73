"""CLI integration: train -> checkpoint -> test (eval) -> detect, on CPU."""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from multispectral_object_detection_tpu.data.synthetic import make_paired_dataset


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliws")
    rgb_dir, ir_dir = make_paired_dataset(str(root / "data"), n_images=8,
                                          img_size=128, nc=2, seed=5)
    data_yaml = root / "synth.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "train_rgb": rgb_dir, "train_ir": ir_dir,
        "val_rgb": rgb_dir, "val_ir": ir_dir,
        "nc": 2, "names": ["red", "blue"],
    }))
    return root, str(data_yaml)


def test_train_test_detect_cli(workspace):
    root, data_yaml = workspace
    from multispectral_object_detection_tpu.cli.train_cli import main as train_main

    res = train_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--epochs", "3", "--batch-size", "4", "--img-size", "128",
        "--project", str(root / "runs"), "--name", "exp", "--fp32",
        "--max-labels", "30", "--hyp", "scratch", "--noautoanchor",
    ])
    run_dir = root / "runs" / "exp"
    assert (run_dir / "last" / "state.msgpack").exists()
    assert (run_dir / "last" / "model.msgpack").exists()  # stripped
    assert (run_dir / "results.txt").exists()
    assert np.isfinite(res["map50"])

    from multispectral_object_detection_tpu.cli.test_cli import main as test_main

    ev = test_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--weights", str(run_dir / "last"), "--batch-size", "4",
        "--img-size", "128", "--fp32",
    ])
    assert np.isfinite(ev["map50"])

    from multispectral_object_detection_tpu.cli.detect_cli import main as det_main

    rgb_dir = yaml.safe_load(Path(data_yaml).read_text())["val_rgb"]
    ir_dir = yaml.safe_load(Path(data_yaml).read_text())["val_ir"]
    out = det_main([
        "--cfg", "yolov5n_fusion_add", "--weights", str(run_dir / "last"),
        "--source1", rgb_dir, "--source2", ir_dir, "--img-size", "128",
        "--conf-thres", "0.1", "--nc", "2", "--fp32", "--save-txt",
        "--project", str(root / "runs_det"), "--name", "exp",
    ])
    assert out["n_images"] == 8
    det_dir = root / "runs_det" / "exp"
    assert any(det_dir.glob("*_rgb.jpg"))


def test_test_cli_report_surface(workspace, tmp_path):
    """--plots/--save-txt/--save-conf/--save-hybrid artifacts land in the
    run dir and read back (reference test.py:253-257, 296-303)."""
    root, data_yaml = workspace
    run_dir = root / "runs" / "exp"  # from test_train_test_detect_cli
    from multispectral_object_detection_tpu.cli.test_cli import main as test_main

    ev = test_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--weights", str(run_dir / "last"), "--batch-size", "4",
        "--img-size", "128", "--fp32", "--plots", "--save-txt",
        "--save-conf", "--project", str(tmp_path / "rt"), "--name", "e"])
    out = tmp_path / "rt" / "e"
    for f in ("confusion_matrix.png", "PR_curve.png", "F1_curve.png",
              "P_curve.png", "R_curve.png"):
        assert (out / f).exists(), f
    txts = list((out / "labels").glob("*.txt"))
    assert len(txts) == 8  # one per val image
    rows = [l.split() for t in txts for l in t.read_text().splitlines()]
    for r in rows:
        assert len(r) == 6  # cls xywh conf (--save-conf)
        assert 0 <= float(r[1]) <= 1 and 0 <= float(r[3]) <= 1
    assert "curves" in ev

    # hybrid autolabelling: GT injected as unit-confidence candidates ->
    # every image yields at least its labels back
    ev2 = test_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--weights", str(run_dir / "last"), "--batch-size", "4",
        "--img-size", "128", "--fp32", "--save-hybrid",
        "--project", str(tmp_path / "rt"), "--name", "h"])
    txts2 = {t.stem: t for t in (tmp_path / "rt" / "h" / "labels").glob("*.txt")}
    assert len(txts2) == 8
    assert ev2["mr"] > 0.99  # GT candidates guarantee full recall


def test_single_stream_cli(workspace, tmp_path):
    """The legacy single-stream path (reference train.py:45 train())."""
    root, data_yaml = workspace
    rgb_dir = yaml.safe_load(Path(data_yaml).read_text())["train_rgb"]
    ss_yaml = tmp_path / "ss.yaml"
    ss_yaml.write_text(yaml.safe_dump({
        "train": rgb_dir, "val": rgb_dir, "nc": 2, "names": ["red", "blue"]}))
    from multispectral_object_detection_tpu.cli.train_cli import main as train_main

    res = train_main([
        "--cfg", "yolov5n", "--data", str(ss_yaml),
        "--epochs", "2", "--batch-size", "4", "--img-size", "128",
        "--project", str(tmp_path / "runs"), "--name", "exp", "--fp32",
        "--max-labels", "30", "--noautoanchor",
    ])
    assert np.isfinite(res["map50"])


def test_resume_roundtrip(workspace):
    root, data_yaml = workspace
    from multispectral_object_detection_tpu.cli.train_cli import main as train_main

    train_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--epochs", "2", "--batch-size", "4", "--img-size", "128",
        "--project", str(root / "runs2"), "--name", "exp", "--fp32",
        "--max-labels", "30", "--noval", "--noautoanchor",
    ])
    res = train_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--epochs", "4", "--batch-size", "4", "--img-size", "128",
        "--project", str(root / "runs2"), "--name", "exp2", "--fp32",
        "--max-labels", "30", "--noval", "--noautoanchor",
        "--resume", str(root / "runs2" / "exp" / "last"),
    ])
    meta = json.loads((root / "runs2" / "exp2" / "last" / "meta.json").read_text())
    assert meta["epoch"] == 3  # resumed at 2, trained to 3


def test_augment_tta_cli(workspace, tmp_path):
    """--augment (TTA) is reachable from both CLIs and changes the
    detection set (reference surface test.py:309 / detect_twostream.py:213;
    upstream's two-stream TTA branch is broken, yolo_test.py:222)."""
    root, data_yaml = workspace
    run_dir = root / "runs" / "exp"  # from test_train_test_detect_cli
    from multispectral_object_detection_tpu.cli.test_cli import main as test_main

    common = ["--cfg", "yolov5n_fusion_add", "--data", data_yaml,
              "--weights", str(run_dir / "last"), "--batch-size", "4",
              "--img-size", "128", "--fp32", "--save-txt", "--save-conf",
              "--project", str(tmp_path / "tta")]
    ev_plain = test_main(common + ["--name", "plain"])
    ev_aug = test_main(common + ["--name", "aug", "--augment"])
    assert np.isfinite(ev_aug["map50"]) and ev_aug["seen"] == 8

    def slurp(name):
        d = tmp_path / "tta" / name / "labels"
        return "".join(sorted(t.stem + t.read_text()
                              for t in d.glob("*.txt")))

    # TTA triples the candidate pool (3 scales) — the NMS output set must
    # change vs the plain forward
    assert slurp("plain") != slurp("aug")

    # incompatible-flag guards
    with pytest.raises(SystemExit):
        test_main(common + ["--name", "x", "--augment", "--compute-loss"])

    from multispectral_object_detection_tpu.cli.detect_cli import main as det_main

    rgb_dir = yaml.safe_load(Path(data_yaml).read_text())["val_rgb"]
    ir_dir = yaml.safe_load(Path(data_yaml).read_text())["val_ir"]
    out = det_main([
        "--cfg", "yolov5n_fusion_add", "--weights", str(run_dir / "last"),
        "--source1", rgb_dir, "--source2", ir_dir, "--img-size", "128",
        "--conf-thres", "0.01", "--nc", "2", "--fp32", "--augment",
        "--nosave", "--project", str(tmp_path / "tta_det"), "--name", "e"])
    assert out["n_images"] == 8


def test_bare_resume_autofind(workspace, tmp_path):
    """Bare --resume locates the newest run's last checkpoint
    (train.py:969-977 via get_latest_run)."""
    root, data_yaml = workspace
    from multispectral_object_detection_tpu.cli.train_cli import main as train_main

    train_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--epochs", "2", "--batch-size", "4", "--img-size", "128",
        "--project", str(tmp_path / "runs3"), "--name", "exp", "--fp32",
        "--max-labels", "30", "--noval", "--noautoanchor",
    ])
    train_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--epochs", "4", "--batch-size", "4", "--img-size", "128",
        "--project", str(tmp_path / "runs3"), "--name", "exp2", "--fp32",
        "--max-labels", "30", "--noval", "--noautoanchor", "--resume",
    ])
    meta = json.loads(
        (tmp_path / "runs3" / "exp2" / "last" / "meta.json").read_text())
    assert meta["epoch"] == 3  # resumed at 2, trained to 3


def test_detect_int8_cli(workspace, tmp_path):
    """--int8 (weights-only int8, models/quantize.py) is reachable from the
    detect CLI and detects on the same images as the fp path (the TPU
    counterpart of the reference's fp16 inference, test.py:66-68)."""
    root, data_yaml = workspace
    run_dir = root / "runs" / "exp"  # from test_train_test_detect_cli
    from multispectral_object_detection_tpu.cli.detect_cli import main as det_main

    cfg_dirs = yaml.safe_load(Path(data_yaml).read_text())
    # conf-thres near zero: a 3-epoch nano model's scores sit below 1e-2,
    # and the point here is flag reachability + a populated NMS pool on
    # both paths (int8 NUMERICS are pinned in tests/test_quantize.py)
    common = ["--cfg", "yolov5n_fusion_add", "--weights", str(run_dir / "last"),
              "--source1", cfg_dirs["val_rgb"], "--source2", cfg_dirs["val_ir"],
              "--img-size", "128", "--conf-thres", "0.0001", "--nc", "2",
              "--fp32", "--nosave", "--save-txt", "--save-conf",
              "--project", str(tmp_path / "det_i8")]
    out_fp = det_main(common + ["--name", "fp"])
    out_q = det_main(common + ["--name", "q", "--int8"])
    assert out_q["n_images"] == out_fp["n_images"] == 8

    def n_boxes(name):
        d = tmp_path / "det_i8" / name / "labels"
        return sum(len(t.read_text().splitlines()) for t in d.glob("*.txt"))

    # weights-only int8 perturbs scores by <2% — the detection pool must
    # survive quantization (borderline boxes may flip either way at the
    # threshold; allow 20% slack for that)
    nf, nq = n_boxes("fp"), n_boxes("q")
    assert nf > 0 and nq > 0 and abs(nq - nf) <= max(4, int(0.2 * nf)), (nf, nq)


def test_quad_train_cli(workspace, tmp_path):
    """--quad (train.py:945): 4 samples -> one 2x-canvas image, loss x4.
    The upstream collate_fn4 crashes on a debug print; ours must train
    end-to-end with finite metrics."""
    root, data_yaml = workspace
    from multispectral_object_detection_tpu.cli.train_cli import main as train_main

    res = train_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--epochs", "2", "--batch-size", "4", "--img-size", "128",
        "--project", str(tmp_path / "runs_q"), "--name", "exp", "--fp32",
        "--max-labels", "30", "--noautoanchor", "--quad",
    ])
    assert np.isfinite(res["map50"])
    run_dir = tmp_path / "runs_q" / "exp"
    assert (run_dir / "last" / "state.msgpack").exists()
    assert (run_dir / "train_batch0.jpg").exists()


def test_img_size_pair_cli(workspace, tmp_path):
    """--img-size accepts a [train, val] pair (train.py:928): the train
    loader runs at sizes[0], the val leg at sizes[-1], and both survive a
    full epoch+eval without shape errors."""
    root, data_yaml = workspace
    from multispectral_object_detection_tpu.cli.train_cli import main as train_main

    res = train_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--epochs", "1", "--batch-size", "4", "--img-size", "128", "96",
        "--project", str(tmp_path / "runs_p"), "--name", "exp", "--fp32",
        "--max-labels", "30", "--noautoanchor",
    ])
    assert np.isfinite(res["map50"])
    opt = yaml.safe_load(
        (tmp_path / "runs_p" / "exp" / "opt.yaml").read_text())
    assert opt["img_size"] == [128, 96]


def test_detect_render_flags(workspace, tmp_path):
    """--line-thickness/--hide-labels/--hide-conf (detect_twostream.py:215,
    :101-103) reach the renderer: the saved image changes when labels are
    hidden, and every flag combination runs end-to-end."""
    root, data_yaml = workspace
    run_dir = root / "runs" / "exp"  # from test_train_test_detect_cli
    from multispectral_object_detection_tpu.cli.detect_cli import main as det_main

    dirs = yaml.safe_load(Path(data_yaml).read_text())
    # near-zero conf so a 3-epoch nano model is guaranteed to draw boxes
    common = ["--cfg", "yolov5n_fusion_add", "--weights", str(run_dir / "last"),
              "--source1", dirs["val_rgb"], "--source2", dirs["val_ir"],
              "--img-size", "128", "--conf-thres", "0.0001", "--nc", "2",
              "--fp32", "--project", str(tmp_path / "render")]
    det_main(common + ["--name", "full"])
    det_main(common + ["--name", "bare", "--hide-labels",
                       "--line-thickness", "1"])
    det_main(common + ["--name", "noconf", "--hide-conf"])

    def first_jpg(name):
        d = tmp_path / "render" / name
        return sorted(d.glob("*_rgb.jpg"))[0].read_bytes()

    # labelled and label-free renders of the same detections must differ
    assert first_jpg("full") != first_jpg("bare")


def test_reference_compat_flags(workspace, tmp_path):
    """Drop-in CLI compatibility with the reference spellings: underscore
    variants (--save_period/--bbox_interval/--upload_dataset, train.py:
    937-956), --notest as the alias of --noval, and the accepted-for-compat
    flags (--device/--sync-bn/--workers/--bucket/--local_rank); detect
    --update strips the checkpoint like strip_optimizer
    (detect_twostream.py:230-232)."""
    import shutil

    root, data_yaml = workspace
    from multispectral_object_detection_tpu.cli.train_cli import parse_args

    a = parse_args([
        "--data", "d.yaml", "--notest", "--save_period", "5",
        "--bbox_interval", "2", "--upload_dataset", "--sync-bn",
        "--workers", "4", "--bucket", "gs://x", "--local_rank", "0",
        "--device", "cpu", "--artifact_alias", "v3"])
    assert a.noval and a.save_period == 5 and a.bbox_interval == 2
    assert a.upload_dataset and a.sync_bn and a.device == "cpu"
    assert a.artifact_alias == "v3"

    # --device cpu + --sync-bn through a real (1-epoch) train
    from multispectral_object_detection_tpu.cli.train_cli import main as train_main
    res = train_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--epochs", "1", "--batch-size", "4", "--img-size", "128",
        "--project", str(tmp_path / "runs_c"), "--name", "exp", "--fp32",
        "--max-labels", "30", "--noautoanchor",
        "--device", "cpu", "--sync-bn"])
    assert "map50" in res

    # detect --update: strips to inference-only weights after the run
    run_dir = root / "runs" / "exp"  # from test_train_test_detect_cli
    ckpt = tmp_path / "ckpt_u"
    shutil.copytree(run_dir / "last", ckpt)
    (ckpt / "model.msgpack").unlink(missing_ok=True)
    dirs = yaml.safe_load(Path(data_yaml).read_text())
    from multispectral_object_detection_tpu.cli.detect_cli import main as det_main
    det_main([
        "--cfg", "yolov5n_fusion_add", "--weights", str(ckpt),
        "--source1", dirs["val_rgb"], "--source2", dirs["val_ir"],
        "--img-size", "128", "--conf-thres", "0.25", "--nc", "2",
        "--fp32", "--nosave", "--update", "--view-img",
        "--project", str(tmp_path / "det_u"), "--name", "e"])
    assert (ckpt / "model.msgpack").exists()
    assert json.loads((ckpt / "meta.json").read_text())["stripped"]


def test_evolve_loop(workspace, tmp_path):
    """Two generations of hyperparameter evolution (train.py:1016 parity):
    gen 0 trains base hyps, gen 1 mutates from the evolve.txt parent pool."""
    root, data_yaml = workspace
    from multispectral_object_detection_tpu.cli.train_cli import main as train_main

    res = train_main([
        "--cfg", "yolov5n_fusion_add", "--data", data_yaml,
        "--epochs", "1", "--batch-size", "4", "--img-size", "128",
        "--project", str(tmp_path / "runs"), "--name", "ev", "--fp32",
        "--max-labels", "30", "--noautoanchor", "--evolve", "2",
    ])
    evolve_dir = tmp_path / "runs" / "ev_evolve"
    lines = (evolve_dir / "evolve.txt").read_text().splitlines()
    assert len(lines) == 2
    assert (evolve_dir / "hyp_evolved.yaml").exists()
    assert "hyp" in res and "lr0" in res["hyp"]


def test_ensemble_weights_cli(workspace, tmp_path):
    """Multi-checkpoint --weights on test/detect (reference attempt_load ->
    Ensemble, experimental.py:113-134). Two identical members under cat
    mode double the candidate pool; mAP must match the single model
    (duplicate boxes NMS away); ds mode runs the evidence-fusion path."""
    root, data_yaml = workspace
    run_dir = root / "runs" / "exp"  # from test_train_test_detect_cli
    from multispectral_object_detection_tpu.cli.test_cli import main as test_main

    common = ["--cfg", "yolov5n_fusion_add", "--data", data_yaml,
              "--batch-size", "4", "--img-size", "128", "--fp32"]
    ev1 = test_main(common + ["--weights", str(run_dir / "last")])
    ev2 = test_main(common + ["--weights", str(run_dir / "last"),
                              str(run_dir / "last")])
    assert np.isfinite(ev2["map50"]) and ev2["seen"] == 8
    # identical members + cat + NMS == the single model's detections
    np.testing.assert_allclose(ev2["map50"], ev1["map50"], atol=1e-6)
    ev_ds = test_main(common + ["--weights", str(run_dir / "last"),
                                str(run_dir / "last"),
                                "--ensemble-mode", "ds"])
    assert np.isfinite(ev_ds["map50"])

    # ensemble forward returns no train_out -> val loss must be refused
    with pytest.raises(SystemExit):
        test_main(common + ["--weights", str(run_dir / "last"),
                            str(run_dir / "last"), "--compute-loss"])

    from multispectral_object_detection_tpu.cli.detect_cli import main as det_main

    rgb_dir = yaml.safe_load(Path(data_yaml).read_text())["val_rgb"]
    ir_dir = yaml.safe_load(Path(data_yaml).read_text())["val_ir"]
    out = det_main([
        "--cfg", "yolov5n_fusion_add", "--weights", str(run_dir / "last"),
        str(run_dir / "last"), "--ensemble-mode", "ds",
        "--source1", rgb_dir, "--source2", ir_dir, "--img-size", "128",
        "--conf-thres", "0.01", "--nc", "2", "--fp32", "--nosave",
        "--project", str(tmp_path / "ens_det"), "--name", "e"])
    assert out["n_images"] == 8
