"""Checkpoint save/load (orbax) + reference-weight import.

Equivalent of the reference's pickle checkpoints
(`engine/trainer.py:424-488`: {epoch, best_fitness, model, ema, updates,
optimizer, train_args, date, version}) and resume
(`trainer.py:621-671`), re-based on orbax: a checkpoint is
{params, ema_params, opt_state, batch_stats, step, config} — pure arrays,
no pickled code.

`import_torch_weights` maps a reference ultralytics `.pt` state_dict onto
our param tree (the reference's own weight surgery lives at
`models/MOTRtrack/model.py:53-94`).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional


def save_checkpoint(path: str, train_state, config: Optional[Dict] = None):
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, dict(train_state._asdict()), force=True)
    ckptr.wait_until_finished()
    if config is not None:
        with open(str(path) + ".config.json", "w") as f:
            json.dump(config, f, indent=2, default=str)


def load_checkpoint(path: str, target=None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ref = dict(target._asdict()) if target is not None else None
    return ckptr.restore(Path(path).resolve(), ref)


def save_params(path: str, variables: Dict[str, Any]):
    """Inference-weights-only save (the reference's `best.pt` analogue)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, variables, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, target=None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).resolve(), target)


# --------------------------------------------------------------------- #
# reference .pt import (name-mapped, torch-cpu)
# --------------------------------------------------------------------- #
def import_torch_weights(pt_path: str, variables: Dict[str, Any],
                         strict: bool = False) -> Dict[str, Any]:
    """Best-effort import of a reference ultralytics `.pt` checkpoint into
    our variable tree (backbone/neck convs + decoder heads). Returns a new
    variables dict; unmatched entries keep their initialization (the
    reference's `intersect_dicts` behavior, `nn/tasks.py:191-203`)."""
    import numpy as np
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    model = ckpt.get("model", ckpt)
    sd = model.state_dict() if hasattr(model, "state_dict") else model
    sd = {k: v.float().numpy() for k, v in sd.items()
          if hasattr(v, "numpy") or hasattr(v, "float")}

    import jax
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    ours = {"/".join(str(getattr(k, "key", getattr(k, "name", k)))
                     for k in path): leaf for path, leaf in flat}

    mapped, missed = {}, []
    for tk, tv in sd.items():
        ok = _map_torch_key(tk)
        if ok is None:
            continue
        if ok in ours and _shapes_compatible(tv, ours[ok]):
            mapped[ok] = _convert(tv, ours[ok])
        else:
            missed.append(tk)
    if strict and missed:
        raise KeyError(f"unmapped torch keys: {missed[:20]}...")

    def rebuild(path, leaf):
        key = "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                       for k in path)
        return mapped.get(key, leaf)

    return jax.tree_util.tree_map_with_path(rebuild, variables)


def _map_torch_key(tk: str) -> Optional[str]:
    """model.<i>.conv.weight -> params/backbone/n<i>/conv/kernel etc."""
    parts = tk.split(".")
    if not parts or parts[0] != "model":
        return None
    # backbone/neck rows: model.{i}.{...}
    try:
        idx = int(parts[1])
    except (IndexError, ValueError):
        return None
    rest = parts[2:]
    out = ["params", "backbone", f"n{idx}"]
    tr = {"cv1": "cv1", "cv2": "cv2", "conv": "conv", "bn": "bn"}
    for p in rest[:-1]:
        if p.startswith("m") and p[1:].isdigit():
            out.append(f"m{p[1:]}")
        elif p == "m":
            continue
        elif p.isdigit():
            out.append(f"m{p}")
        else:
            out.append(tr.get(p, p))
    leaf = {"weight": "kernel", "bias": "bias",
            "running_mean": "mean", "running_var": "var"}.get(rest[-1])
    if leaf is None:
        return None
    if rest[-1] in ("running_mean", "running_var"):
        out[0] = "batch_stats"   # flax keeps BN stats in their own collection
    if rest[-2:-1] == ["bn"] and rest[-1] in ("weight", "bias"):
        leaf = {"weight": "scale", "bias": "bias"}[rest[-1]]
    return "/".join(out + [leaf])


def _shapes_compatible(tv, ours) -> bool:
    import numpy as np

    tshape = tuple(tv.shape)
    oshape = tuple(ours.shape)
    if tshape == oshape:
        return True
    # conv OIHW -> HWIO
    if len(tshape) == 4 and (tshape[2], tshape[3], tshape[1], tshape[0]) == oshape:
        return True
    # linear [out,in] -> [in,out]
    if len(tshape) == 2 and (tshape[1], tshape[0]) == oshape:
        return True
    return False


def _convert(tv, ours):
    import numpy as np

    tshape = tuple(tv.shape)
    oshape = tuple(ours.shape)
    if len(tshape) == 4 and tshape != oshape:
        return np.transpose(tv, (2, 3, 1, 0)).astype(np.float32)
    if len(tshape) == 2 and tshape != oshape:
        return tv.T.astype(np.float32)
    return tv.astype(np.float32)
