"""model_info / FLOP estimate / ensemble / LAMR tests."""

import jax
import jax.numpy as jnp
import numpy as np

from multispectral_object_detection_tpu.models import build_model
from multispectral_object_detection_tpu.models.configs import yolov5


def test_model_info_and_flops():
    from multispectral_object_detection_tpu.utils.profiling import (
        estimate_flops, model_info, per_layer_costs)

    model = build_model(yolov5("n", nc=2))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    info = model_info(model, v["params"], img_size=64)
    assert info["params"] > 1e5
    # yolov5n @64px forward: order 0.1 GFLOPs
    if info["flops"]:
        assert 1e7 < info["flops"] < 1e10
    rows = per_layer_costs(model, v["params"])
    assert len(rows) == len(model.spec.nodes)
    assert sum(r["params"] for r in rows) == info["params"]


def test_ensemble_concat():
    from multispectral_object_detection_tpu.hub import Ensemble

    ens = Ensemble([("yolov5n", None), ("yolov5n", None)], nc=1)
    x = jnp.zeros((1, 64, 64, 3))
    d = ens.decode_all(x)
    single = ens.members[0][0]
    v = {"params": ens.members[0][1], "batch_stats": ens.members[0][2]}
    n1 = single.decode(single.apply(v, x)).shape[1]
    assert d.shape == (1, 2 * n1, 6)


def test_log_average_miss_rate():
    from multispectral_object_detection_tpu.utils.metrics import (
        log_average_miss_rate)

    # perfect detector: all GT found with no FPs -> tiny LAMR
    tp = np.ones(10, dtype=bool)
    conf = np.linspace(1, 0.5, 10)
    lamr = log_average_miss_rate(tp, conf, n_images=10, n_gt=10)
    assert lamr < 1e-6
    # detector that finds nothing -> LAMR 1
    assert log_average_miss_rate(np.zeros(5, bool), conf[:5], 10, 10) == 1.0
    # half recall with some FPs -> in between
    tp2 = np.array([1, 1, 0, 1, 0, 1, 0, 0, 1, 0], dtype=bool)
    mid = log_average_miss_rate(tp2, conf, 10, 10)
    assert 0.2 < mid < 1.0


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """Persistent-cache helper: sets the jax config knobs, honors the
    MT_NO_COMPILATION_CACHE opt-out, and a jitted call writes an entry."""
    import secrets

    import jax
    from jax.experimental.compilation_cache import compilation_cache as cc

    from multispectral_object_detection_tpu.utils.general import (
        enable_compilation_cache)

    cache = tmp_path / "cc"
    # try/finally: a mid-test failure must not leave the persistent cache
    # enabled with a 0 s threshold for every later jit in this process
    try:
        enable_compilation_cache(str(cache))
        # jax initializes its persistent-cache object once and ignores
        # later jax_compilation_cache_dir updates; earlier CLI tests in
        # the same process already pointed it at ~/.cache/mt_jax_cache,
        # so force re-initialization at the tmp dir
        cc.reset_cache()
        assert jax.config.jax_compilation_cache_dir == str(cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        # bake a unique constant into the program so this compile can't be
        # served from the in-process executable cache (a plain 64x64 matmul
        # may already be cached by earlier tests in the same run, which
        # would skip the compile and never touch the persistent cache)
        salt = secrets.randbits(31)

        @jax.jit
        def f(x):
            return (x @ x).sum() + salt

        float(f(jax.numpy.ones((64, 64))))
        assert any(cache.iterdir())

        # opt-out leaves config untouched
        monkeypatch.setenv("MT_NO_COMPILATION_CACHE", "1")
        enable_compilation_cache(str(tmp_path / "other"))
        assert jax.config.jax_compilation_cache_dir == str(cache)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        # drop the cache object pinned to the (soon-deleted) tmp dir
        cc.reset_cache()
