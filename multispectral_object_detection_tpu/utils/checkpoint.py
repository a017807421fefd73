"""Checkpoint save/load: pure pytree state, no pickled code.

The reference checkpoints pickle the entire nn.Module (train.py:850-866) —
fragile across code versions. Here a checkpoint is a directory with:
    state.msgpack   flax-serialized pytree {params, batch_stats, opt_state,
                    ema_params, ema_stats, step, ema_updates}
    meta.json       {epoch, best_fitness, spec_hash, results}
`strip` finalizes for inference: EMA weights only (general.py:546
strip_optimizer equivalent).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


_pending = None  # at most one outstanding background write
_pending_error = None  # exception raised by the last background write


def _write_checkpoint(p: Path, host_state, info) -> None:
    """Serialize + write atomically (tmp file + os.replace), so a crash
    mid-write never leaves a torn state.msgpack behind (resume safety)."""
    p.mkdir(parents=True, exist_ok=True)
    blob = serialization.msgpack_serialize(host_state)
    tmp = p / "state.msgpack.tmp"
    tmp.write_bytes(blob)
    os.replace(tmp, p / "state.msgpack")
    mtmp = p / "meta.json.tmp"
    mtmp.write_text(json.dumps(info, indent=1))
    os.replace(mtmp, p / "meta.json")


def save_checkpoint(path: str, state, *, epoch: int, best_fitness: float,
                    meta: Optional[Dict[str, Any]] = None,
                    background: bool = False):
    """Write a checkpoint dir; with `background=True` the (CPU-bound)
    msgpack serialization + disk write run in a thread so the train loop
    only pays the device->host fetch. The device fetch is synchronous
    either way — the caller's state buffers may be donated by the next
    step. At most one write is outstanding (a new save joins the previous
    one first); call `wait_pending()` before reading a checkpoint back or
    exiting."""
    global _pending
    p = Path(path)
    host_state = jax.tree.map(lambda x: np.asarray(x), _state_dict(state))
    info = {"epoch": int(epoch), "best_fitness": float(best_fitness)}
    info.update(meta or {})
    if not background:
        _write_checkpoint(p, host_state, info)
        return
    import threading

    wait_pending()  # re-raises if the PREVIOUS background write failed

    def _run():
        global _pending_error
        try:
            _write_checkpoint(p, host_state, info)
        except BaseException as e:  # surfaced by the next wait_pending()
            _pending_error = e

    _pending = threading.Thread(target=_run, daemon=False)
    _pending.start()


def wait_pending() -> None:
    """Block until the outstanding background checkpoint write finishes.

    Re-raises any exception the writer thread hit (disk full, permissions):
    a silently-failed write would leave last/best stale while training
    reports success."""
    global _pending, _pending_error
    if _pending is not None:
        _pending.join()
        _pending = None
    if _pending_error is not None:
        err, _pending_error = _pending_error, None
        raise RuntimeError("background checkpoint write failed") from err


def _state_dict(state) -> Dict[str, Any]:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": serialization.to_state_dict(state.opt_state),
        "ema_params": state.ema_params,
        "ema_stats": state.ema_stats,
        "step": state.step,
        "ema_updates": state.ema_updates,
    }


def load_checkpoint(path: str, state=None):
    """Returns (raw_dict, meta). If `state` is given, restores into it
    (including opt_state structure) and returns (state, meta)."""
    p = Path(path)
    raw = serialization.msgpack_restore((p / "state.msgpack").read_bytes())
    meta = json.loads((p / "meta.json").read_text()) if (p / "meta.json").exists() else {}
    if state is None:
        return raw, meta
    new = state.replace(
        params=serialization.from_state_dict(state.params, raw["params"]),
        batch_stats=serialization.from_state_dict(state.batch_stats,
                                                  raw["batch_stats"]),
        opt_state=serialization.from_state_dict(state.opt_state,
                                                raw["opt_state"]),
        ema_params=serialization.from_state_dict(state.ema_params,
                                                 raw["ema_params"]),
        ema_stats=serialization.from_state_dict(state.ema_stats,
                                                raw["ema_stats"]),
        step=raw["step"], ema_updates=raw["ema_updates"])
    return new, meta


def partial_load(target_tree, source_tree):
    """Shape-matched partial parameter transfer — the `intersect_dicts` of
    utils/torch_utils.py:138 used for warm-starting (train.py:517-523).

    Copies every leaf whose path exists in `source_tree` with an identical
    shape; everything else keeps the freshly-initialized value. Returns
    (merged_tree, n_copied, n_total).
    """
    n_copied = 0
    n_total = 0

    def walk(t, s):
        nonlocal n_copied, n_total
        if isinstance(t, dict):
            return {k: walk(v, s.get(k) if isinstance(s, dict) else None)
                    for k, v in t.items()}
        n_total += 1
        if s is not None and getattr(s, "shape", None) == t.shape:
            n_copied += 1
            return np.asarray(s).astype(t.dtype) if hasattr(t, "dtype") else s
        return t

    merged = walk(target_tree, source_tree or {})
    return merged, n_copied, n_total


def strip_checkpoint(path: str, out_path: Optional[str] = None):
    """Finalize for inference: keep EMA params + stats only (halves size)."""
    p = Path(path)
    raw = serialization.msgpack_restore((p / "state.msgpack").read_bytes())
    meta = json.loads((p / "meta.json").read_text()) if (p / "meta.json").exists() else {}
    out = Path(out_path or path)
    out.mkdir(parents=True, exist_ok=True)
    slim = {"params": raw["ema_params"], "batch_stats": raw["ema_stats"]}
    # atomic (tmp + rename): a kill mid-write must never leave a torn
    # model.msgpack shadowing the intact state.msgpack
    tmp = out / "model.msgpack.tmp"
    tmp.write_bytes(serialization.msgpack_serialize(slim))
    os.replace(tmp, out / "model.msgpack")
    meta["stripped"] = True
    (out / "meta.json").write_text(json.dumps(meta, indent=1))


def stack_param_trees(trees):
    """Stack same-structure pytrees along a new leading member axis —
    the storage form of a CLI `--weights a b c` ensemble (reference
    attempt_load, experimental.py:114-134; members must share one --cfg
    since our checkpoints carry no code, by design). jnp.stack (not
    np.stack): leaves may already be bf16 device arrays post-cast."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def load_inference_params(path: str):
    """Load a stripped (or full) checkpoint for inference: (params, stats)."""
    p = Path(path)
    if (p / "model.msgpack").exists():
        raw = serialization.msgpack_restore((p / "model.msgpack").read_bytes())
        return raw["params"], raw["batch_stats"]
    raw = serialization.msgpack_restore((p / "state.msgpack").read_bytes())
    return raw["ema_params"], raw["ema_stats"]
