"""Detect head conv + decode parity vs the reference Detect (yolo_test.py:25).

tests/data/detect_golden.npz: fixed conv weights, two pyramid inputs, and
the reference's decoded inference output (xy/wh in pixels + sigmoided
obj/cls). The reference flattens (na, ny, nx)-major while we flatten
(ny, nx, na)-major, so rows are compared as sorted sets.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from multispectral_object_detection_tpu.models.detect import (
    Detect, decode_predictions)

GOLDEN = Path(__file__).parent / "data" / "detect_golden.npz"
ANCHORS = ((10, 13, 16, 30, 33, 23), (30, 61, 62, 45, 59, 119))


def test_detect_decode_matches_reference():
    z = np.load(GOLDEN)
    head = Detect(nc=3, anchors=ANCHORS, strides=(8, 16))
    params = {"params": {
        "m0": {"kernel": z["w0"].transpose(2, 3, 1, 0), "bias": z["b0"]},
        "m1": {"kernel": z["w1"].transpose(2, 3, 1, 0), "bias": z["b1"]},
    }}
    xs = [jnp.asarray(z["x0"].transpose(0, 2, 3, 1)),
          jnp.asarray(z["x1"].transpose(0, 2, 3, 1))]
    feats = head.apply(params, xs)
    anc = np.asarray(ANCHORS, dtype=np.float32).reshape(2, 3, 2)
    dets = np.asarray(decode_predictions(feats, anc, (8, 16)))

    want = z["z"]  # (2, 240, 8)
    assert dets.shape == want.shape
    # order differs (na-major vs hw-major): compare as sorted row sets
    for b in range(want.shape[0]):
        a = dets[b][np.lexsort(dets[b].T)]
        w = want[b][np.lexsort(want[b].T)]
        np.testing.assert_allclose(a, w, rtol=1e-4, atol=1e-4)
