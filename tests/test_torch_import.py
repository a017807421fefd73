"""Full-network forward equivalence vs the reference Model under imported
torch weights.

tests/data/net_golden.npz: a mini config (Focus/Conv/C3/SPP/Upsample/Concat/
Detect — every single-stream module kind), its torch state_dict
(deterministically regenerated), an input batch, and the reference Model's
raw per-scale training outputs. The test imports the torch weights through
utils/torch_import.convert_state_dict and checks OUR forward reproduces the
reference network bit-for-bit (to fp32 tolerance) — pinning conv padding,
BN inference math, SiLU, Focus slicing, SPP pooling, upsample, concat
routing and the Detect conv in one shot. Also exercises the
intersect_dicts-style warm-start merge path.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multispectral_object_detection_tpu.models import build_model
from multispectral_object_detection_tpu.utils.checkpoint import partial_load
from multispectral_object_detection_tpu.utils.torch_import import (
    convert_state_dict)

DATA = Path(__file__).parent / "data"


def test_forward_equivalence_with_imported_torch_weights():
    z = np.load(DATA / "net_golden.npz")
    cfg = json.loads((DATA / "net_golden_cfg.json").read_text())
    sd = {k: z[k] for k in z.files if not k.startswith("__")}

    model = build_model(cfg)
    x = jnp.asarray(z["__input__"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    variables = model.init(jax.random.PRNGKey(0), x)

    imported_params, imported_stats = convert_state_dict(sd)
    params, n_cp, n_tot = partial_load(variables["params"], imported_params)
    stats, n_cs, _ = partial_load(variables["batch_stats"], imported_stats)
    # every learnable tensor must transfer
    assert n_cp == n_tot, f"only {n_cp}/{n_tot} params transferred"
    assert n_cs > 0

    feats = model.apply({"params": params, "batch_stats": stats}, x,
                        train=False)
    for i in range(3):
        want = z[f"__out{i}__"]                      # (B, na, ny, nx, no)
        got = np.asarray(feats[i]).transpose(0, 3, 1, 2, 4)  # ours: B,ny,nx,na,no
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gpt_weights_import_matches_fusion_golden():
    """The importer's GPT mapping reproduces the fusion golden weights."""
    z = np.load(DATA / "gpt_golden.npz")
    sd = {f"model.10.{k}": z[k] for k in z.files
          if k not in ("rgb", "ir", "o1", "o2")}
    from multispectral_object_detection_tpu.utils.torch_import import (
        convert_state_dict)

    params, _ = convert_state_dict(sd)
    p = params["blocks_10"]
    assert p["qkv_w"].shape == (2, 64, 192)
    assert p["fc1_w"].shape == (2, 64, 256)

    # run the fusion stage with imported params; must match the golden output
    from multispectral_object_detection_tpu.models.fusion import (
        CrossModalFusion)

    mod = CrossModalFusion(d_model=64, n_layer=2)
    rgb = jnp.asarray(z["rgb"].transpose(0, 2, 3, 1))
    ir = jnp.asarray(z["ir"].transpose(0, 2, 3, 1))
    o1, o2 = mod.apply({"params": {k: jnp.asarray(v) for k, v in p.items()}},
                       (rgb, ir), train=False)
    np.testing.assert_allclose(np.asarray(o1),
                               z["o1"].transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-5)


def test_c3tr_transformer_import_forward_equivalence():
    """C3TR / TransformerBlock / nn.MultiheadAttention import parity.

    tests/data/c3tr_golden.npz (regenerate: tools/gen_c3tr_golden.py) holds
    a mini Focus->Conv->C3TR->Detect reference net's torch state_dict, an
    input batch and its raw eval outputs. Pins the MultiheadAttention
    parameterization (packed in_proj + out_proj, common.py:60) that was a
    round-1 param-structure gap."""
    z = np.load(DATA / "c3tr_golden.npz")
    cfg = json.loads((DATA / "c3tr_golden_cfg.json").read_text())
    sd = {k: z[k] for k in z.files if not k.startswith("__")}

    model = build_model(cfg)
    x = jnp.asarray(z["__input__"].transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), x)

    imported_params, imported_stats = convert_state_dict(sd)
    params, n_cp, n_tot = partial_load(variables["params"], imported_params)
    stats, n_cs, _ = partial_load(variables["batch_stats"], imported_stats)
    assert n_cp == n_tot, f"only {n_cp}/{n_tot} params transferred"

    feats = model.apply({"params": params, "batch_stats": stats}, x,
                        train=False)
    for i in range(3):
        want = z[f"__out{i}__"]
        got = np.asarray(feats[i]).transpose(0, 3, 1, 2, 4)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
