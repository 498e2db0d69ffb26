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
# Key layout of a reference MOTRTrack checkpoint (state_dict of
# `ultralytics/nn/tasks.py:TrackingModel`):
#   model.{i}.{...}                      backbone/neck rows (Conv/C2f/SPPF)
#   model.{H}.decoder.{...}              MYDecoder (`nn/modules/head.py:807`)
#   model.{H}.track_embed.{...}          QIM (`MOTR/models/qim.py:73`)
# where H is the head row (22 in yolo_track.yaml). RT-DETR checkpoints
# carry the decoder attrs directly under model.{H}.{...}; the reference's
# own weight surgery inserts the `decoder.` segment
# (`models/MOTRtrack/model.py:53-65`) — we accept both spellings.
#
# Deliberately skipped torch keys (no functional counterpart here):
#   query_pos_head.*  — dead parameter: MOTRTransformerDecoder.forward
#                       receives pos_mlp but never calls it
#                       (`nn/modules/transformer.py:677-728`)
#   tgt_embed.*       — learnt_init_query path, off in the track configs
#   track_embed.linear_feat*/norm_feat — the reference QIM's write of
#                       refreshed content INTO `query_pos`
#                       (`MOTR/models/qim.py:289-298`); our QIM keeps
#                       content in `embedding` (updated via linear1/2)
#   *.num_batches_tracked, dfl.*, anchors/strides buffers

_HEAD_ATTRS = frozenset({
    "decoder", "input_proj", "denoising_class_embed", "query_pos_head",
    "enc_output", "enc_score_head", "enc_bbox_head", "dec_score_head",
    "dec_bbox_head", "tgt_embed", "track_embed",
})

_SKIP_HEAD_PREFIXES = ("query_pos_head", "tgt_embed",
                       "track_embed.linear_feat1", "track_embed.linear_feat2",
                       "track_embed.norm_feat")


def import_torch_weights(pt_path: str, variables: Dict[str, Any],
                         strict: bool = False,
                         require_full: bool = False) -> Dict[str, Any]:
    """Import a reference ultralytics `.pt` checkpoint into our variable
    tree (backbone/neck + full MYDecoder head + QIM). Unmatched entries
    keep their initialization (the reference's `intersect_dicts` behavior,
    `nn/tasks.py:191-203`) unless `strict`/`require_full`."""
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    model = ckpt.get("model", ckpt)
    sd = model.state_dict() if hasattr(model, "state_dict") else model
    sd = {k: v.float().numpy() for k, v in sd.items()
          if hasattr(v, "numpy") or hasattr(v, "float")}
    new_vars, report = apply_torch_state_dict(sd, variables, strict=strict,
                                              require_full=require_full)
    # auditable import summary: the param-count delta vs the reference
    # (~266k in reference-side dead modules) must be traceable to the
    # exact keys that were not mapped
    from mo_yolo_tpu.utils.logging import LOGGER
    LOGGER.info(
        f"torch import: mapped {len(report['mapped'])} leaves; "
        f"skipped-by-design {len(report['skipped'])} torch keys"
        + (f" {sorted(report['skipped'])[:8]}..." if report['skipped']
           else "")
        + (f"; UNMAPPED {len(report['missed'])} torch keys "
           f"{sorted(report['missed'])[:8]}" if report['missed'] else ""))
    return new_vars


def apply_torch_state_dict(sd: Dict[str, Any], variables: Dict[str, Any],
                           strict: bool = False, require_full: bool = False):
    """Map a {torch_key: np.ndarray} state_dict onto our variable tree.

    Returns (new_variables, report) where report has:
      mapped   {our_key: torch_key}
      missed   [torch keys that should map but found no/mismatched target]
      skipped  [torch keys with no counterpart by design]
      untouched [our param/batch_stats keys not covered by the state_dict]

    strict: raise on `missed`.  require_full: additionally raise if any of
    OUR leaves stays untouched (full-coverage import).
    """
    import numpy as np
    import jax

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    ours = {_path_str(path): leaf for path, leaf in flat}

    mapped_vals: Dict[str, Any] = {}
    mapped, missed, skipped = {}, [], []
    for tk, tv in sd.items():
        entries = _expand_torch_entry(tk, np.asarray(tv))
        if entries is None:          # deliberate skip
            skipped.append(tk)
            continue
        hit = False
        for okey, val, tag in entries:
            if okey in ours:
                conv = _convert(val, ours[okey], tag)
                if conv is not None:
                    mapped_vals[okey] = conv
                    mapped[okey] = tk
                    hit = True
        if not hit:
            missed.append(tk)
    if strict and missed:
        raise KeyError(f"unmapped torch keys ({len(missed)}): {missed[:20]}")
    untouched = [k for k in ours if k not in mapped_vals]
    if require_full and untouched:
        raise KeyError(
            f"state_dict left {len(untouched)} of our leaves untouched: "
            f"{untouched[:20]}")

    def rebuild(path, leaf):
        return mapped_vals.get(_path_str(path), leaf)

    new_vars = jax.tree_util.tree_map_with_path(rebuild, variables)
    report = {"mapped": mapped, "missed": missed, "skipped": skipped,
              "untouched": untouched}
    return new_vars, report


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                    for k in path)


def _expand_torch_entry(tk: str, tv):
    """torch (key, value) -> [(our_key, value, transform)] | [] | None.

    [] = expected to map but couldn't (counts as missed at the caller if
    no entry lands); None = deliberately skipped.
    transform in {'conv','dense','none'}.
    """
    parts = tk.split(".")
    if not parts or parts[0] != "model":
        return None
    try:
        int(parts[1])
    except (IndexError, ValueError):
        return None
    rest = parts[2:]
    if not rest:
        return None
    if rest[-1] == "num_batches_tracked":
        return None
    v8 = _expand_v8_head_entry(rest, tv)
    if v8 is not ...:
        if rest[0] in ("conv", "linear"):
            # `model.N.conv.*` is ambiguous: Classify head vs a backbone
            # row whose module has a `.conv` child (LightConv in HG
            # graphs). Emit both candidate paths; apply lands whichever
            # exists in the target tree.
            bb = _expand_backbone_entry(parts[1], rest, tv)
            if bb:
                v8 = (v8 or []) + bb
        return v8
    if rest[0] in _HEAD_ATTRS:
        if rest[0] == "decoder" and len(rest) > 1 and rest[1] in _HEAD_ATTRS:
            rest = rest[1:]          # surgery spelling model.H.decoder.X
        return _expand_head_entry(rest, tv)
    return _expand_backbone_entry(parts[1], rest, tv)


def _conv_bn_entries(bases, tail, tv):
    """ConvBnAct leaves under each candidate base path.
    tail = torch sub-key within the Conv module, e.g. ("conv","weight")
    or ("bn","running_mean")."""
    out = []
    for base in bases:
        if tail[0] == "conv" and tail[1] == "weight":
            out.append((f"{base}/conv/kernel", tv, "conv"))
        elif tail[0] == "bn":
            leaf = tail[1]
            if leaf == "weight":
                out.append((f"{base}/bn/scale", tv, "none"))
            elif leaf == "bias":
                out.append((f"{base}/bn/bias", tv, "none"))
            elif leaf == "running_mean":
                out.append((base.replace("params/", "batch_stats/", 1)
                            + "/bn/mean", tv, "none"))
            elif leaf == "running_var":
                out.append((base.replace("params/", "batch_stats/", 1)
                            + "/bn/var", tv, "none"))
    return out


def _expand_v8_head_entry(rest, tv):
    """YOLOv8 task heads (Detect/Segment/Pose/Classify,
    `nn/modules/head.py:27-599` + `block.py:Proto`): cv2/cv3 box+cls
    branches, cv4 mask-coef/keypoint branch, Proto, Classify conv+linear.

    Returns `...` (Ellipsis) when the key is NOT a v8 head key so the
    caller falls through to the decoder-head / backbone routes. Candidate
    paths are emitted for every composition that hosts the head
    (`NASModel.head`, `SegmentHead/PoseHead .detect`); apply lands
    whichever exists in the target tree."""
    if rest[0] == "dfl":
        return None          # fixed arange conv — we decode analytically
    if rest[0] in ("cv2", "cv3", "cv4") and len(rest) >= 4 \
            and rest[1].isdigit() and rest[2].isdigit():
        i, j = rest[1], rest[2]
        name = f"{rest[0]}_{i}_{j}"
        bases = [f"params/head/{name}"]
        if rest[0] != "cv4":     # detect branch also nests under Seg/Pose
            bases.append(f"params/head/detect/{name}")
        if j == "2":             # plain nn.Conv2d output projection
            leaf = rest[3]
            if leaf == "weight":
                return [(f"{b}/kernel", tv, "conv") for b in bases]
            if leaf == "bias":
                return [(f"{b}/bias", tv, "none") for b in bases]
            return []
        return _conv_bn_entries(bases, tuple(rest[3:5]), tv)
    if rest[0] == "proto" and len(rest) >= 3:
        sub = rest[1]
        base = f"params/head/proto/{sub}"
        if sub == "upsample":
            if rest[2] == "weight":
                return [(f"{base}/kernel", tv, "convT")]
            if rest[2] == "bias":
                return [(f"{base}/bias", tv, "none")]
            return []
        return _conv_bn_entries([f"params/head/proto/{sub}"],
                                tuple(rest[2:4]), tv)
    # Classify head: model.N.conv.{conv|bn}.* + model.N.linear.*
    if rest[0] == "conv" and len(rest) >= 3 and rest[1] in ("conv", "bn"):
        return _conv_bn_entries(["params/head/conv"], tuple(rest[1:3]), tv)
    if rest[0] == "linear" and len(rest) == 2:
        return _linear_or_norm("params/head/linear", True, rest[1], tv)
    return ...


def _expand_backbone_entry(idx: str, rest, tv):
    # AIFI rows (rt-detr graphs): MHA + dense FFN + LayerNorms, not convs
    if rest[0] == "ma":
        return _mha_entries(f"params/backbone/n{idx}/ma", rest[1:], tv)
    if rest[0] in ("fc1", "fc2"):
        return _linear_or_norm(f"params/backbone/n{idx}/{rest[0]}", True,
                               rest[1], tv)
    if rest[0] in ("norm1", "norm2") and len(rest) == 2:
        return _linear_or_norm(f"params/backbone/n{idx}/{rest[0]}", False,
                               rest[1], tv)
    node = f"n{idx}"
    if rest[0].isdigit():
        # row-level nn.Sequential (bare Bottleneck repeats in the v3
        # graphs, `tasks.py:940-942`): model.{i}.{r}.* -> n{i}_{r}/*
        node = f"n{idx}_{rest[0]}"
        rest = rest[1:]
    if len(rest) == 1 and rest[0] in ("weight", "bias"):
        # raw parameterized layer directly under model.{i}: the only one
        # the graphs ship is nn.ConvTranspose2d (v6 head rows)
        if rest[0] == "weight":
            return [(f"params/backbone/{node}/kernel", tv, "convT")]
        return [(f"params/backbone/{node}/bias", tv, "none")]
    out = ["params", "backbone", node]
    for p in rest[:-1]:
        if p == "m":
            continue                  # ModuleList wrapper: m.0 -> m0
        if p.isdigit():
            out.append(f"m{p}")
        else:
            out.append(p)
    leaf, tag = {
        "weight": ("kernel", "conv"), "bias": ("bias", "none"),
        "running_mean": ("mean", "none"), "running_var": ("var", "none"),
    }.get(rest[-1], (None, None))
    if leaf is None:
        return None if rest[-1].startswith("num_batches") else []
    if rest[-1] in ("running_mean", "running_var"):
        out[0] = "batch_stats"
    if rest[-2:-1] == ["bn"]:
        if rest[-1] == "weight":
            leaf, tag = "scale", "none"
    return [("/".join(out + [leaf]), tv, tag)]


def _expand_head_entry(rest, tv):
    """Map a MYDecoder/QIM torch sub-key to our TrackDecoder/QIM paths."""
    key = ".".join(rest)
    for pre in _SKIP_HEAD_PREFIXES:
        if key.startswith(pre):
            return None
    P = "params/decoder"

    if rest[0] == "input_proj":
        i, sub, leaf = rest[1], rest[2], rest[3]
        if sub == "0":               # 1x1 conv, bias-free
            return [(f"{P}/input_proj{i}_conv/kernel", tv, "conv")]
        if leaf == "weight":
            return [(f"{P}/input_proj{i}_bn/scale", tv, "none")]
        if leaf == "bias":
            return [(f"{P}/input_proj{i}_bn/bias", tv, "none")]
        if leaf == "running_mean":
            return [(f"batch_stats/decoder/input_proj{i}_bn/mean", tv, "none")]
        if leaf == "running_var":
            return [(f"batch_stats/decoder/input_proj{i}_bn/var", tv, "none")]
        return []

    if rest[0] == "denoising_class_embed":
        return [(f"{P}/denoising_class_embed/embedding", tv, "none")]

    if rest[0] == "enc_output":
        base = f"{P}/enc_output_dense" if rest[1] == "0" else f"{P}/enc_output_ln"
        return _linear_or_norm(base, rest[1] == "0", rest[2], tv)

    if rest[0] == "enc_score_head":
        return _linear_or_norm(f"{P}/enc_score_head", True, rest[1], tv)

    if rest[0] == "enc_bbox_head":   # enc_bbox_head.layers.{j}.{w|b}
        return _linear_or_norm(f"{P}/enc_bbox_head/layers{rest[2]}", True,
                               rest[3], tv)

    if rest[0] == "dec_score_head":  # dec_score_head.{l}.{w|b}
        return _linear_or_norm(f"{P}/decoder/score_head{rest[1]}", True,
                               rest[2], tv)

    if rest[0] == "dec_bbox_head":   # dec_bbox_head.{l}.layers.{j}.{w|b}
        return _linear_or_norm(
            f"{P}/decoder/bbox_head{rest[1]}/layers{rest[3]}", True,
            rest[4], tv)

    if rest[0] == "decoder" and rest[1] == "layers":
        l, mod = rest[2], rest[3]
        base = f"{P}/decoder/layer{l}"
        if mod == "self_attn":
            return _mha_entries(f"{base}/self_attn", rest[4:], tv)
        if mod == "cross_attn":      # MSDeformAttn sub-linears
            return _linear_or_norm(f"{base}/cross_attn/{rest[4]}", True,
                                   rest[5], tv)
        if mod.startswith("norm"):
            return _linear_or_norm(f"{base}/{mod}", False, rest[4], tv)
        if mod.startswith("linear"):
            return _linear_or_norm(f"{base}/{mod}", True, rest[4], tv)
        return []

    if rest[0] == "track_embed":     # QIM (MOTR/models/qim.py:73-115)
        q = "params/qim"
        sub = rest[1]
        name_map = {"linear1": "linear1", "linear2": "linear2",
                    "norm1": "norm1", "norm2": "norm2",
                    "linear_pos1": "pos_linear1", "linear_pos2": "pos_linear2",
                    "norm_pos": "pos_norm"}
        if sub == "self_attn":
            return _mha_entries(f"{q}/self_attn", rest[2:], tv)
        if sub in name_map:
            is_dense = sub.startswith("linear")
            return _linear_or_norm(f"{q}/{name_map[sub]}", is_dense,
                                   rest[2], tv)
        if sub.startswith("dropout"):
            return None
        return []

    return []


def _linear_or_norm(base: str, is_dense: bool, leaf: str, tv):
    if leaf == "weight":
        return [(f"{base}/kernel" if is_dense else f"{base}/scale", tv,
                 "dense" if is_dense else "none")]
    if leaf == "bias":
        return [(f"{base}/bias", tv, "none")]
    return []


def _mha_entries(base: str, rest, tv):
    """torch nn.MultiheadAttention -> our q/k/v/out projections.
    in_proj_weight is [3C, C] with rows (q|k|v); flax kernels are [C, C]
    transposed."""
    import numpy as np

    if rest[0] == "in_proj_weight":
        C = tv.shape[1]
        return [(f"{base}/{n}_proj/kernel", tv[i * C:(i + 1) * C], "dense")
                for i, n in enumerate("qkv")]
    if rest[0] == "in_proj_bias":
        C = tv.shape[0] // 3
        return [(f"{base}/{n}_proj/bias", tv[i * C:(i + 1) * C], "none")
                for i, n in enumerate("qkv")]
    if rest[0] == "out_proj":
        return _linear_or_norm(f"{base}/out_proj", True, rest[1], tv)
    return []


def _convert(tv, ours, tag: str):
    """Apply the layout transform; None if shapes don't line up."""
    import numpy as np

    tshape, oshape = tuple(tv.shape), tuple(ours.shape)
    if tag == "conv":
        if len(tshape) == 4 and (tshape[2], tshape[3], tshape[1],
                                 tshape[0]) == oshape:
            return np.transpose(tv, (2, 3, 1, 0)).astype(np.float32)
        return None
    if tag == "dense":
        # ALWAYS transpose [out,in] -> [in,out]; square kernels included
        if len(tshape) == 2 and (tshape[1], tshape[0]) == oshape:
            return np.ascontiguousarray(tv.T).astype(np.float32)
        return None
    if tag == "convT":
        # torch ConvTranspose2d [in,out,kH,kW] -> flax ConvTranspose HWIO
        # with spatial flip (verified numerically vs torch)
        if len(tshape) == 4 and (tshape[2], tshape[3], tshape[0],
                                 tshape[1]) == oshape:
            return np.ascontiguousarray(
                np.transpose(tv, (2, 3, 0, 1))[::-1, ::-1]).astype(np.float32)
        return None
    return tv.astype(np.float32) if tshape == oshape else None


# --------------------------------------------------------------------- #
# inverse: our variables -> torch-style state_dict
# --------------------------------------------------------------------- #
def _inverse_v8_head(parts, arr, H, dense, conv):
    """Inverse of `_expand_v8_head_entry`: our `{params|batch_stats}/head/...`
    leaves back to reference v8 task-head tensor names
    (Detect/Segment/Pose cv2/cv3/cv4 + Proto, Classify conv+linear —
    `nn/modules/head.py:27-599`, `block.py:Proto`). The DFL conv is
    analytic on our side; the reference initializes it to the same fixed
    arange, so leaving it at init preserves function parity."""
    import numpy as np

    def convT(a):
        # invert the 'convT' import transform: flip + HWIO -> [in,out,kH,kW]
        return np.transpose(a[::-1, ::-1], (2, 3, 0, 1))

    def bn_name(leaf):
        return {"scale": "weight", "bias": "bias", "mean": "running_mean",
                "var": "running_var"}[leaf]

    rest = parts[2:]
    if rest[0] == "detect":          # Segment/Pose nest the Detect branch
        rest = rest[1:]
    name = rest[0]
    if name.split("_")[0] in ("cv2", "cv3", "cv4") and name.count("_") == 2:
        cv, i, j = name.split("_")
        base = f"{H}.{cv}.{i}.{j}"
        if j == "2":                 # plain nn.Conv2d output projection
            leaf = rest[1]
            if leaf == "kernel":
                return f"{base}.weight", conv(arr)
            return f"{base}.bias", arr
        sub, leaf = rest[1], rest[2]
        if sub == "conv":
            return f"{base}.conv.weight", conv(arr)
        return f"{base}.bn.{bn_name(leaf)}", arr
    if name == "proto":
        sub, tail = rest[1], rest[2:]
        if sub == "upsample":
            if tail[0] == "kernel":
                return f"{H}.proto.upsample.weight", convT(arr)
            return f"{H}.proto.upsample.bias", arr
        if tail[0] == "conv":
            return f"{H}.proto.{sub}.conv.weight", conv(arr)
        return f"{H}.proto.{sub}.bn.{bn_name(tail[1])}", arr
    if name == "conv" and len(rest) >= 3:    # Classify stem Conv
        sub, leaf = rest[1], rest[2]
        if sub == "conv":
            return f"{H}.conv.conv.weight", conv(arr)
        return f"{H}.conv.bn.{bn_name(leaf)}", arr
    if name == "linear":             # Classify output projection
        leaf = rest[1]
        return (f"{H}.linear.{'weight' if leaf == 'kernel' else 'bias'}",
                dense(arr) if leaf == "kernel" else arr)
    return None, None


def export_torch_state_dict(variables: Dict[str, Any],
                            head_idx: int = 22) -> Dict[str, Any]:
    """Render our variable tree as a reference-layout numpy state_dict
    (the exact inverse of `apply_torch_state_dict`). Used to hand weights
    back to a torch runtime and to round-trip-test import coverage."""
    import numpy as np
    import jax

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    sd: Dict[str, Any] = {}
    pend_qkv: Dict[str, Dict[str, Any]] = {}

    for path, leaf in flat:
        key = _path_str(path)
        arr = np.asarray(leaf, dtype=np.float32)
        tk, val = _inverse_map(key, arr, head_idx, pend_qkv)
        if tk is not None:
            sd[tk] = val
    # fuse collected q/k/v projections into torch in_proj tensors
    for base, parts in pend_qkv.items():
        if all(f"{n}_proj/kernel" in parts for n in "qkv"):
            sd[f"{base}.in_proj_weight"] = np.concatenate(
                [parts[f"{n}_proj/kernel"].T for n in "qkv"], axis=0)
        if all(f"{n}_proj/bias" in parts for n in "qkv"):
            sd[f"{base}.in_proj_bias"] = np.concatenate(
                [parts[f"{n}_proj/bias"] for n in "qkv"], axis=0)
    return sd


def _inverse_map(key: str, arr, head_idx: int, pend_qkv):
    import numpy as np

    parts = key.split("/")
    coll, top = parts[0], parts[1]
    H = f"model.{head_idx}"

    def dense(a):
        return np.ascontiguousarray(a.T)

    def conv(a):
        return np.transpose(a, (3, 2, 0, 1))

    if top == "backbone":
        idx = parts[2][1:]             # n{i} (or n{i}_{r} sequential slot)
        if "_" in idx:
            i0, r = idx.split("_", 1)
            idx = f"{i0}.{r}"
        if len(parts) == 4 and parts[3] == "kernel" and arr.ndim == 4:
            # raw nn.ConvTranspose2d kernel (no conv/bn child): invert
            # the convT import transform (flip + HWIO -> [in,out,kH,kW])
            return (f"model.{idx}.weight",
                    np.transpose(arr[::-1, ::-1], (2, 3, 0, 1)))
        if len(parts) > 3 and parts[3] == "ma":        # AIFI attention
            proj, leaf = parts[4], parts[5]
            if proj == "out_proj":
                val = dense(arr) if leaf == "kernel" else arr
                return (f"model.{idx}.ma.out_proj."
                        f"{'weight' if leaf == 'kernel' else 'bias'}", val)
            pend_qkv.setdefault(f"model.{idx}.ma",
                                {})[f"{proj}/{leaf}"] = arr
            return None, None
        if len(parts) == 5 and parts[3] in ("fc1", "fc2"):
            leaf = parts[4]
            return (f"model.{idx}.{parts[3]}."
                    f"{'weight' if leaf == 'kernel' else 'bias'}",
                    dense(arr) if leaf == "kernel" else arr)
        if len(parts) == 5 and parts[3] in ("norm1", "norm2"):
            leaf = parts[4]
            return (f"model.{idx}.{parts[3]}."
                    f"{'weight' if leaf == 'scale' else 'bias'}", arr)
        mids = []
        for p in parts[3:-1]:
            if p[0] == "m" and p[1:].isdigit():
                mids += ["m", p[1:]]
            else:
                mids.append(p)
        leaf = parts[-1]
        tname = {"kernel": "weight", "scale": "weight", "bias": "bias",
                 "mean": "running_mean", "var": "running_var"}[leaf]
        val = conv(arr) if leaf == "kernel" else arr
        return ".".join([f"model.{idx}"] + mids + [tname]), val

    if top == "head":
        return _inverse_v8_head(parts, arr, H, dense, conv)

    if top == "qim" or (top == "decoder" and len(parts) > 2):
        if top == "qim":
            sub = parts[2]
            if sub == "self_attn":
                proj, leaf = parts[3], parts[4]
                if proj == "out_proj":
                    val = dense(arr) if leaf == "kernel" else arr
                    return (f"{H}.track_embed.self_attn.out_proj."
                            f"{'weight' if leaf == 'kernel' else 'bias'}", val)
                pend_qkv.setdefault(f"{H}.track_embed.self_attn",
                                    {})[f"{proj}/{leaf}"] = arr
                return None, None
            inv = {"linear1": "linear1", "linear2": "linear2",
                   "norm1": "norm1", "norm2": "norm2",
                   "pos_linear1": "linear_pos1", "pos_linear2": "linear_pos2",
                   "pos_norm": "norm_pos"}[sub]
            leaf = parts[3]
            if sub.startswith("linear") or sub.startswith("pos_linear"):
                val = dense(arr) if leaf == "kernel" else arr
                return (f"{H}.track_embed.{inv}."
                        f"{'weight' if leaf == 'kernel' else 'bias'}", val)
            return (f"{H}.track_embed.{inv}."
                    f"{'weight' if leaf == 'scale' else 'bias'}", arr)

        # decoder head
        D = f"{H}.decoder"
        sub = parts[2]
        if sub.startswith("input_proj"):
            i = sub[len("input_proj"):-len("_bn")] \
                if sub.endswith("_bn") else sub[len("input_proj"):-len("_conv")]
            if sub.endswith("_conv"):
                return f"{D}.input_proj.{i}.0.weight", conv(arr)
            leaf = parts[3]
            tname = {"scale": "weight", "bias": "bias",
                     "mean": "running_mean", "var": "running_var"}[leaf]
            return f"{D}.input_proj.{i}.1.{tname}", arr
        if sub == "denoising_class_embed":
            return f"{D}.denoising_class_embed.weight", arr
        if sub == "enc_output_dense":
            leaf = parts[3]
            return (f"{D}.enc_output.0."
                    f"{'weight' if leaf == 'kernel' else 'bias'}",
                    dense(arr) if leaf == "kernel" else arr)
        if sub == "enc_output_ln":
            leaf = parts[3]
            return (f"{D}.enc_output.1."
                    f"{'weight' if leaf == 'scale' else 'bias'}", arr)
        if sub == "enc_score_head":
            leaf = parts[3]
            return (f"{D}.enc_score_head."
                    f"{'weight' if leaf == 'kernel' else 'bias'}",
                    dense(arr) if leaf == "kernel" else arr)
        if sub == "enc_bbox_head":
            j, leaf = parts[3][len("layers"):], parts[4]
            return (f"{D}.enc_bbox_head.layers.{j}."
                    f"{'weight' if leaf == 'kernel' else 'bias'}",
                    dense(arr) if leaf == "kernel" else arr)
        if sub == "decoder":
            inner = parts[3]
            if inner.startswith("score_head"):
                l, leaf = inner[len("score_head"):], parts[4]
                return (f"{D}.dec_score_head.{l}."
                        f"{'weight' if leaf == 'kernel' else 'bias'}",
                        dense(arr) if leaf == "kernel" else arr)
            if inner.startswith("bbox_head"):
                l = inner[len("bbox_head"):]
                j, leaf = parts[4][len("layers"):], parts[5]
                return (f"{D}.dec_bbox_head.{l}.layers.{j}."
                        f"{'weight' if leaf == 'kernel' else 'bias'}",
                        dense(arr) if leaf == "kernel" else arr)
            if inner.startswith("layer"):
                l = inner[len("layer"):]
                L = f"{D}.decoder.layers.{l}"
                mod = parts[4]
                if mod == "self_attn":
                    proj, leaf = parts[5], parts[6]
                    if proj == "out_proj":
                        val = dense(arr) if leaf == "kernel" else arr
                        return (f"{L}.self_attn.out_proj."
                                f"{'weight' if leaf == 'kernel' else 'bias'}",
                                val)
                    pend_qkv.setdefault(f"{L}.self_attn",
                                        {})[f"{proj}/{leaf}"] = arr
                    return None, None
                if mod == "cross_attn":
                    name, leaf = parts[5], parts[6]
                    return (f"{L}.cross_attn.{name}."
                            f"{'weight' if leaf == 'kernel' else 'bias'}",
                            dense(arr) if leaf == "kernel" else arr)
                if mod.startswith("norm"):
                    leaf = parts[5]
                    return (f"{L}.{mod}."
                            f"{'weight' if leaf == 'scale' else 'bias'}", arr)
                if mod.startswith("linear"):
                    leaf = parts[5]
                    return (f"{L}.{mod}."
                            f"{'weight' if leaf == 'kernel' else 'bias'}",
                            dense(arr) if leaf == "kernel" else arr)
    return None, None
