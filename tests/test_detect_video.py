"""Video-source detection CLI test."""

import numpy as np
import pytest


def test_detect_on_video(tmp_path):
    import cv2

    # synthesize a tiny mp4
    vid = tmp_path / "in.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 5, (96, 96))
    rng = np.random.default_rng(0)
    for _ in range(6):
        w.write(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
    w.release()
    assert vid.stat().st_size > 0

    # random-weight single-stream detector over the video
    from multispectral_object_detection_tpu.cli.detect_cli import main
    from multispectral_object_detection_tpu.hub import create
    from multispectral_object_detection_tpu.utils.checkpoint import (
        save_checkpoint, strip_checkpoint)
    from multispectral_object_detection_tpu.train.trainer import TrainState
    import jax.numpy as jnp

    model, params, stats = create("yolov5n", nc=1)
    ckpt = tmp_path / "ckpt"
    state = TrainState(params=params, batch_stats=stats, opt_state={},
                       ema_params=params, ema_stats=stats,
                       step=jnp.zeros((), jnp.int32),
                       ema_updates=jnp.zeros((), jnp.int32))
    save_checkpoint(str(ckpt), state, epoch=0, best_fitness=0.0)
    strip_checkpoint(str(ckpt))

    out = main(["--cfg", "yolov5n", "--weights", str(ckpt),
                "--source1", str(vid), "--img-size", "96", "--nc", "1",
                "--conf-thres", "0.5", "--fp32",
                "--project", str(tmp_path / "runs"), "--name", "v"])
    assert out["n_images"] == 6
    assert (tmp_path / "runs" / "v" / "output.mp4").exists()
