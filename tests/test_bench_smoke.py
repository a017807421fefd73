"""bench.py smoke: the driver's BENCH artifact rides this script, so a
regression (arg plumbing, fused-model build, NMS wiring, JSON contract)
must fail in the suite, not in the round snapshot. CPU, nano scale."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run_bench(extra=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize re-pins to axon
    env["MT_NO_COMPILATION_CACHE"] = "1"
    out = subprocess.run(
        [sys.executable, "bench.py", "--scale", "n", "--img", "64",
         "--batch", "2", "--iters", "3", "--warmup", "1", *extra],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.parametrize("extra,metric", [
    ((), "cft_n_64_dual_stream_inference_pairs_per_sec_per_chip"),
    (("--tta",), "cft_n_64_dual_stream_inference_tta_pairs_per_sec_per_chip"),
])
def test_bench_cpu_smoke(extra, metric):
    line = _run_bench(extra)
    assert line["metric"] == metric
    assert line["unit"] == "image-pairs/s"
    assert line["value"] > 0 and line["vs_baseline"] > 0
