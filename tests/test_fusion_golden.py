"""Forward-parity of the CFT fusion stage vs the reference GPT module.

tests/data/gpt_golden.npz holds inputs, weights (deterministically
regenerated into the torch module) and outputs produced once by the
reference models/common.py:549 GPT (d_model=64, 2 layers, 8 heads, eval
mode) on 16x16 feature maps. This pins the ENTIRE fusion stage numerics:
adaptive pooling, tokenization, pos-emb, pre-LN attention blocks, final LN,
split and bilinear upsample.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multispectral_object_detection_tpu.models.fusion import CrossModalFusion

GOLDEN = Path(__file__).parent / "data" / "gpt_golden.npz"


def _torch_to_stacked(z, L, C):
    """Map reference GPT state_dict arrays to the stacked param layout."""
    def g(name):
        return z[name]

    ln1 = np.stack([np.stack([g(f"trans_blocks.{i}.ln_input.weight"),
                              g(f"trans_blocks.{i}.ln_input.bias")])
                    for i in range(L)])
    ln2 = np.stack([np.stack([g(f"trans_blocks.{i}.ln_output.weight"),
                              g(f"trans_blocks.{i}.ln_output.bias")])
                    for i in range(L)])
    qkv_w = np.stack([np.concatenate([
        g(f"trans_blocks.{i}.sa.que_proj.weight").T,
        g(f"trans_blocks.{i}.sa.key_proj.weight").T,
        g(f"trans_blocks.{i}.sa.val_proj.weight").T], axis=1)
        for i in range(L)])
    qkv_b = np.stack([np.concatenate([
        g(f"trans_blocks.{i}.sa.que_proj.bias"),
        g(f"trans_blocks.{i}.sa.key_proj.bias"),
        g(f"trans_blocks.{i}.sa.val_proj.bias")]) for i in range(L)])
    proj_w = np.stack([g(f"trans_blocks.{i}.sa.out_proj.weight").T
                       for i in range(L)])
    proj_b = np.stack([g(f"trans_blocks.{i}.sa.out_proj.bias")
                       for i in range(L)])
    fc1_w = np.stack([g(f"trans_blocks.{i}.mlp.0.weight").T for i in range(L)])
    fc1_b = np.stack([g(f"trans_blocks.{i}.mlp.0.bias") for i in range(L)])
    fc2_w = np.stack([g(f"trans_blocks.{i}.mlp.2.weight").T for i in range(L)])
    fc2_b = np.stack([g(f"trans_blocks.{i}.mlp.2.bias") for i in range(L)])
    return {
        "pos_emb": g("pos_emb"),
        "ln1": ln1, "qkv_w": qkv_w, "qkv_b": qkv_b,
        "proj_w": proj_w, "proj_b": proj_b,
        "ln2": ln2, "fc1_w": fc1_w, "fc1_b": fc1_b,
        "fc2_w": fc2_w, "fc2_b": fc2_b,
        "ln_f": np.stack([g("ln_f.weight"), g("ln_f.bias")]),
    }


@pytest.mark.parametrize("use_pallas_interpret", [False, True])
def test_fusion_stage_matches_reference_gpt(use_pallas_interpret):
    z = np.load(GOLDEN)
    C, L = 64, 2
    params = {k: jnp.asarray(v) for k, v in _torch_to_stacked(z, L, C).items()}

    rgb = jnp.asarray(z["rgb"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
    ir = jnp.asarray(z["ir"].transpose(0, 2, 3, 1))

    if use_pallas_interpret:
        import multispectral_object_detection_tpu.ops.pallas_fusion as pf

        orig = pf.fused_cft_stack

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig.__wrapped__(*a, **kw)  # bypass jit for interpret

        pf_patched = interp
        mod = CrossModalFusion(d_model=C, n_layer=L, use_pallas=True)
        # monkeypatch within the call
        pf.fused_cft_stack, saved = pf_patched, pf.fused_cft_stack
        try:
            o1, o2 = mod.apply({"params": params}, (rgb, ir), train=False)
        finally:
            pf.fused_cft_stack = saved
    else:
        mod = CrossModalFusion(d_model=C, n_layer=L, use_pallas=False)
        o1, o2 = mod.apply({"params": params}, (rgb, ir), train=False)

    want1 = z["o1"].transpose(0, 2, 3, 1)
    want2 = z["o2"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(o1), want1, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o2), want2, rtol=2e-4, atol=2e-5)
