"""Graph executor: ModelSpec -> flax module running the compiled layer list.

Mirrors the walk of the reference `Model.forward_once`
(models/yolo_test.py:235-272): layers run in row order, outputs needed later
are kept in a save-dict, multi-input rows gather from it, and rows whose
``from`` is -4 consume the second (IR) input. Unlike the reference, the
executor is a pure function of (params, state, inputs) and the whole graph —
including two backbones, three CFT fusion stages, the PANet neck and the
Detect head — traces into a single XLA program.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from . import layers as L
from .detect import Detect, decode_predictions
from .fusion import CrossModalFusion
from .parser import ModelSpec, Node, parse_model_config


def _build_module(node: Node, dtype, fused: bool = False,
                  use_pallas: bool = False,
                  use_pallas_c3: bool = False) -> nn.Module:
    k, a = node.kind, node.args
    if k == "Conv":
        return L.ConvBnAct(c2=a[1], k=a[2] if len(a) > 2 else 1,
                           s=a[3] if len(a) > 3 else 1,
                           p=a[4] if len(a) > 4 else None,
                           g=a[5] if len(a) > 5 else 1, dtype=dtype,
                           fused=fused)
    if k == "DWConv":
        return L.dwconv(a[0], a[1], a[2] if len(a) > 2 else 1,
                        a[3] if len(a) > 3 else 1, dtype=dtype, fused=fused)
    if k == "Focus":
        return L.Focus(c2=a[1], k=a[2] if len(a) > 2 else 1,
                       s=a[3] if len(a) > 3 else 1, dtype=dtype, fused=fused)
    if k == "Bottleneck":
        return L.Bottleneck(a[0], a[1],
                            shortcut=a[2] if len(a) > 2 else True, dtype=dtype,
                            fused=fused)
    if k == "BottleneckCSP":
        return L.BottleneckCSP(a[0], a[1], n=a[2],
                               shortcut=a[3] if len(a) > 3 else True,
                               dtype=dtype, fused=fused)
    if k == "C3":
        return L.C3(a[0], a[1], n=a[2],
                    shortcut=a[3] if len(a) > 3 else True, dtype=dtype,
                    fused=fused, use_pallas=use_pallas_c3)
    if k == "C3TR":
        return L.C3TR(a[0], a[1], n=a[2],
                      shortcut=a[3] if len(a) > 3 else True, dtype=dtype,
                      fused=fused)
    if k == "MixConv2d":
        return L.MixConv2d(a[0], a[1], k=tuple(a[2]) if len(a) > 2 else (1, 3),
                           s=a[3] if len(a) > 3 else 1, dtype=dtype)
    if k == "Sum":
        return L.Sum(n=a[0], weight=a[1] if len(a) > 1 else False)
    if k == "Classify":
        return L.Classify(c2=a[1], dtype=dtype)
    if k == "TransformerBlock":
        return L.TransformerBlock2D(a[0], a[1], a[2], a[3], dtype=dtype,
                                    fused=fused)
    if k == "SPP":
        return L.SPP(a[0], a[1], k=tuple(a[2]) if len(a) > 2 else (5, 9, 13),
                     dtype=dtype, fused=fused)
    if k == "GhostConv":
        return L.GhostConv(c2=a[1], k=a[2] if len(a) > 2 else 1,
                           s=a[3] if len(a) > 3 else 1, dtype=dtype,
                           fused=fused)
    if k == "GhostBottleneck":
        return L.GhostBottleneck(a[0], a[1], k=a[2] if len(a) > 2 else 3,
                                 s=a[3] if len(a) > 3 else 1, dtype=dtype,
                                 fused=fused)
    if k == "CrossConv":
        return L.CrossConv(a[0], a[1], k=a[2] if len(a) > 2 else 3,
                           s=a[3] if len(a) > 3 else 1, dtype=dtype,
                           fused=fused)
    if k == "Contract":
        return L.Contract(gain=a[0] if a else 2)
    if k == "Expand":
        return L.Expand(gain=a[0] if a else 2)
    if k == "Concat":
        return L.Concat()
    if k == "Add":
        return L.Add()
    if k == "Add2":
        return L.Add2(index=a[1])
    if k == "GPT":
        return CrossModalFusion(d_model=a[0], dtype=dtype,
                                use_pallas=use_pallas)
    if k == "Upsample":
        # reference rows: [None, 2, 'nearest']
        scale = a[1] if len(a) > 1 else 2
        mode = a[2] if len(a) > 2 else "nearest"
        return L.Upsample(scale=int(scale), mode=str(mode))
    if k == "MaxPool2d":
        # torch nn.MaxPool2d rows: [k, s, pad] (yolov3-tiny)
        return L.MaxPool2d(k=a[0], s=a[1] if len(a) > 1 else a[0],
                           p=a[2] if len(a) > 2 else 0)
    if k == "ZeroPad2d":
        return L.ZeroPad2d(padding=tuple(a[0]))
    raise ValueError(f"no builder for module kind {k!r}")


class DetectionModel(nn.Module):
    """Executable detection graph. Call with NHWC uint8-scaled floats.

    Returns the tuple of raw per-scale Detect outputs
    ``((B, ny, nx, na, 5+nc), ...)``; use `decode` for flat detections.
    """

    spec: ModelSpec
    dtype: Any = jnp.float32
    fused: bool = False       # BN folded into conv weights (inference only)
    use_pallas: bool = False  # fused Pallas CFT stack (inference only)
    use_pallas_c3: bool = False  # fused Pallas C3 bottlenecks (inference only)
    # per-block activation rematerialization (--remat blocks): each graph
    # node is wrapped in jax.checkpoint, so the backward pass keeps only
    # block-boundary activations and recomputes intra-block temporaries
    # (conv+BN+SiLU chains). Finer than wrapping the whole loss closure
    # (trainer.remat_wrap 'full'/'dots'), which round-2 measured as
    # counterproductive.
    remat_blocks: bool = False

    def setup(self):
        mods = []
        for node in self.spec.nodes:
            if node.kind == "Detect":
                mods.append(Detect(nc=node.args[0], anchors=self.spec.anchors,
                                   strides=self.spec.strides, dtype=self.dtype))
            elif node.repeats > 1:
                mods.append([_build_module(node, self.dtype, self.fused,
                                           self.use_pallas,
                                           self.use_pallas_c3)
                             for _ in range(node.repeats)])
            else:
                mods.append(_build_module(node, self.dtype, self.fused,
                                          self.use_pallas,
                                          self.use_pallas_c3))
        self.blocks = mods

    def __call__(self, x, x2=None, train: bool = False,
                 tap_index: Optional[int] = None, tap=None):
        """Run the graph. With ``tap_index`` set, also returns the activation
        at that node as ``(output, activation)``; a non-None ``tap`` array is
        ADDED to that activation before downstream layers consume it. A zero
        tap is a no-op forward whose gradient w.r.t. ``tap`` is the gradient
        w.r.t. the intermediate activation — the hook Grad-CAM rides
        (utils/gradcam.py, the working version of reference utils/gradcam.py).
        ``tap_index`` is a Python int, so it is static under jit.
        """
        if self.spec.two_stream and x2 is None:
            raise ValueError("two-stream model needs both RGB and IR inputs")
        saved = {}
        tapped = None
        cur = x.astype(self.dtype)
        x2 = None if x2 is None else x2.astype(self.dtype)
        for node, mod in zip(self.spec.nodes, self.blocks):
            if node.frm == (-4,) and not node.multi:
                inp = x2
            elif node.frm == (-1,) and not node.multi:
                inp = cur
            elif node.multi:
                inp = [cur if j == -1 else saved[j] for j in node.frm]
            else:
                inp = saved[node.frm[0]]
            if self.remat_blocks:
                def block(mdl, y, _i=node.index, _train=train):
                    return mdl._apply_block(_i, y, _train)

                cur = nn.remat(block)(self, inp)
            else:
                cur = self._apply_block(node.index, inp, train)
            if tap_index is not None and node.index == tap_index:
                if tap is not None:
                    cur = cur + tap.astype(cur.dtype)
                tapped = cur
            if node.index in self.spec.save:
                saved[node.index] = cur
        if tap_index is not None:
            if tapped is None:
                raise ValueError(
                    f"tap_index {tap_index} is not a node of this graph "
                    f"(0..{len(self.spec.nodes) - 1})")
            return cur, tapped
        return cur

    def _apply_block(self, i: int, inp, train: bool):
        mod = self.blocks[i]
        if isinstance(mod, (list, tuple)):
            for m in mod:
                inp = m(inp, train=train)
            return inp
        return mod(inp, train=train)

    def decode(self, feats):
        anc = np.asarray(self.spec.anchors, dtype=np.float32).reshape(
            self.spec.nl, -1, 2)
        return decode_predictions(feats, anc, self.spec.strides)


def build_model(cfg, ch_in: int = 3, nc: Optional[int] = None, anchors=None,
                dtype=jnp.float32, fused: bool = False,
                use_pallas: bool = False, use_pallas_c3: bool = False,
                remat_blocks: bool = False) -> DetectionModel:
    """YAML path/dict -> DetectionModel (the `Model(cfg)` of yolo_test.py:165)."""
    spec = cfg if isinstance(cfg, ModelSpec) else parse_model_config(
        cfg, ch_in=ch_in, nc=nc, anchors=anchors)
    return DetectionModel(spec=spec, dtype=dtype, fused=fused,
                          use_pallas=use_pallas, use_pallas_c3=use_pallas_c3,
                          remat_blocks=remat_blocks)


def cast_inference_params(tree, dtype):
    """Pre-cast stored float params to the compute dtype.

    With a bf16 compute dtype flax casts each non-normalization param at
    use inside the jit anyway, so this is numerically identical for those
    leaves — but storing them in bf16 halves the HBM weight traffic per
    batch (the flagship's 206M params read as 412MB instead of 824MB;
    measured +2.4% end-to-end throughput on v5e).

    Normalization leaves are left fp32: BatchNorm (`bn*`) and LayerNorm
    (`ln*`/`norm*`) modules compute in fp32 on purpose (layers.py Conv),
    so down-casting their scales/biases/stats WOULD change numerics.
    batch_stats trees should not be passed here for the same reason.
    """
    import jax

    if dtype == jnp.float32:
        return tree

    def cast(path, x):
        if not (hasattr(x, "dtype") and x.dtype == jnp.float32):
            return x
        for k in path:
            name = getattr(k, "key", "")
            if isinstance(name, str) and (
                    name.startswith("bn") or name.startswith("ln")
                    or "norm" in name):
                return x
        return x.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, tree)


def fuse_conv_bn(params, batch_stats, eps: float = 1e-3):
    """Fold BatchNorm into conv kernels + biases for inference.

    The functional equivalent of the reference `Model.fuse()`
    (yolo_test.py:296-304, torch_utils.py:181-201): every {conv, bn} pair
    becomes a conv with
        kernel' = kernel * gamma / sqrt(var + eps)   (per output channel)
        bias'   = beta - mean * gamma / sqrt(var + eps)
    Returns `(fused_params, residual_batch_stats)`. Subtrees without a
    conv/bn pair pass through unchanged — their BN (BottleneckCSP,
    MixConv2d, CrossConv hold bare `nn.BatchNorm`s) stays LIVE, so its
    stats are kept in `residual_batch_stats` and MUST still be passed at
    apply time; only the folded pairs' stats are dropped.
    """
    def walk(p, s):
        if not isinstance(p, dict):
            return p, None
        if "conv" in p and "bn" in p and s is not None and "bn" in s:
            kernel = p["conv"]["kernel"]
            gamma = p["bn"]["scale"]
            beta = p["bn"]["bias"]
            mean = s["bn"]["mean"]
            var = s["bn"]["var"]
            g = gamma / jnp.sqrt(var + eps)
            new = {"conv": {"kernel": kernel * g, "bias": beta - mean * g}}
            res = {}
            # recurse into any sibling submodules (e.g. Focus holds only conv)
            for k, v in p.items():
                if k not in ("conv", "bn"):
                    new[k], r = walk(v, s.get(k) if isinstance(s, dict)
                                     else None)
                    if r:
                        res[k] = r
            return new, (res or None)
        out, res = {}, {}
        skeys = set(s.keys()) if isinstance(s, dict) else set()
        for k, v in p.items():
            out[k], r = walk(v, s.get(k) if isinstance(s, dict) else None)
            if r:
                res[k] = r
            skeys.discard(k)
        # stats subtrees with no params sibling (bare BatchNorm leaves its
        # mean/var here) survive verbatim
        for k in skeys:
            res[k] = s[k]
        return out, (res or None)

    fused, residual = walk(
        params, batch_stats if isinstance(batch_stats, dict) else {})
    return fused, (residual or {})


def fuse_conv_bn_params(params, batch_stats, eps: float = 1e-3):
    """Back-compat wrapper over `fuse_conv_bn` returning only the params.

    Callers that discard batch_stats after this are only correct when every
    BN in the graph is conv-adjacent (true for all shipped configs except
    those using BottleneckCSP/MixConv2d/CrossConv) — prefer `fuse_conv_bn`.
    """
    return fuse_conv_bn(params, batch_stats, eps)[0]
