"""YAML-driven model graph builder.

TPU-native counterpart of the reference's `parse_model`
(`ultralytics/nn/tasks.py:881-956`): reads ultralytics-style model yamls
(backbone/head rows of `[from, repeats, module, args]`) and materializes a
flax module that executes the DAG with a save-list cache for skip
connections. Reference yamls like `yolo_track.yaml` load unmodified.

The head row (`MOTRTrack` / `RTDETRDecoder` / `Detect`) is *not* executed
here — the graph stops at the multi-scale feature taps and returns them; the
tracking/detection head is a separate module composed by the task model
(`mo_yolo_tpu.models.tracking_model`). This keeps the CNN graph a pure
feature extractor that can be jitted/fused independently.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import yaml
from flax import linen as nn

from mo_yolo_tpu.models.layers import (AIFI, SPP, SPPF, Bottleneck, C2f, C3,
                                       ConvBnAct, ConvTranspose, DWConv,
                                       Focus, GhostConv, HGBlock, HGStem,
                                       RepC3, RepConv, concat, upsample2x)

HEAD_MODULES = {"MOTRTrack", "RTDETRDecoder", "MYDecoder", "Detect", "Segment",
                "Pose", "Classify"}


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


@dataclasses.dataclass(frozen=True)
class NodeSpec:
    index: int
    frm: Tuple[int, ...]     # input node indices (-1 = previous)
    module: str              # 'Conv' | 'C2f' | 'SPPF' | 'Upsample' | 'Concat'
    repeats: int
    args: Tuple[Any, ...]
    out_channels: int


@dataclasses.dataclass(frozen=True)
class GraphSpec:
    nodes: Tuple[NodeSpec, ...]
    out_indices: Tuple[int, ...]   # feature taps consumed by the head
    out_channels: Tuple[int, ...]
    out_strides: Tuple[int, ...]
    nc: int
    head_module: str
    head_args: Tuple[Any, ...]
    # yaml `activation:` override (v6 graphs set nn.ReLU(); the reference
    # rebinds Conv.default_act globally, `tasks.py:887-899`) — threaded to
    # every ConvBnAct this graph and its Detect head construct
    act: Any = True


def parse_model_yaml(cfg: Union[str, Dict], nc: Optional[int] = None) -> GraphSpec:
    """Parse an ultralytics-style model yaml into a static GraphSpec.

    Accepts a path or an already-loaded dict. `nc` overrides the yaml's class
    count (like the reference's dataset-driven override, `tasks.py:243-247`).
    """
    if isinstance(cfg, str):
        with open(cfg) as f:
            cfg = yaml.safe_load(f)
    nc = nc if nc is not None else int(cfg.get("nc", 80))
    act_map = {None: True, "nn.SiLU()": True, "nn.ReLU()": "relu"}
    if cfg.get("activation") not in act_map:
        raise ValueError(f"unsupported yaml activation override: "
                         f"{cfg.get('activation')!r}")
    default_act = act_map[cfg.get("activation")]
    depth = float(cfg.get("depth_multiple", 1.0))
    width = float(cfg.get("width_multiple", 1.0))
    max_channels = float("inf")
    if "scales" in cfg and cfg["scales"] and cfg.get("scale"):
        depth, width, max_channels = cfg["scales"][cfg["scale"]]

    rows = list(cfg["backbone"]) + list(cfg["head"])
    ch: List[int] = [3]
    nodes: List[NodeSpec] = []
    strides: List[int] = [1]  # stride of the *input* of node i is strides[frm+1]
    node_stride: List[int] = []
    head_row = None

    for i, (frm, n, mod, args) in enumerate(rows):
        mod = str(mod)
        frm_t = tuple(frm) if isinstance(frm, (list, tuple)) else (frm,)
        # resolve relative from-indices to absolute node indices; -1 at row 0
        # stays -1 = the model input
        frm_t = tuple(f if f >= 0 else i + f for f in frm_t)
        # yaml `None` parses as the STRING "None" (the reference evals row
        # args through `eval`, `tasks.py:895-899`; rt-detr Conv rows use it)
        args = [None if a == "None" else (nc if a == "nc" else a)
                for a in (args or [])]
        n_rep = max(round(n * depth), 1) if n > 1 else n

        if mod in HEAD_MODULES:
            head_row = (frm_t, mod, tuple(args))
            break  # head is always the last row in these yamls

        def in_ch(f):
            return ch[f + 1]                   # ch[0] is the model input

        def in_stride(f):
            return node_stride[f] if f >= 0 else 1

        if mod == "Conv":
            c2 = make_divisible(min(args[0], max_channels) * width)
            k = args[1] if len(args) > 1 else 1
            s = args[2] if len(args) > 2 else 1
            # extended reference signature (c2, k, s, p, g, d, act) — the
            # rt-detr graphs use act=False 1x1 input-proj convs; the v5
            # graphs pass an explicit p (k=6 stem, autopad would be 3)
            p = args[3] if len(args) > 3 and args[3] is not None else None
            act = args[6] if len(args) > 6 else default_act
            # n>1 Conv rows (v6 graphs) are sequential repeats — the
            # reference wraps non-C-blocks in nn.Sequential
            # (`tasks.py:940-942`); stride compounds per repeat
            nodes.append(NodeSpec(i, frm_t, "Conv", n_rep,
                                  (c2, k, s, act, p), c2))
            st = (in_stride(frm_t[0]) if node_stride else 1) * (s ** n_rep)
        elif mod == "ConvTranspose":
            c2 = make_divisible(min(args[0], max_channels) * width)
            k = args[1] if len(args) > 1 else 2
            s = args[2] if len(args) > 2 else 2
            nodes.append(NodeSpec(i, frm_t, "ConvTranspose", 1, (c2, k, s),
                                  c2))
            st = max(in_stride(frm_t[0]) // s, 1)
        elif mod == "Focus":
            c2 = make_divisible(min(args[0], max_channels) * width)
            k = args[1] if len(args) > 1 else 1
            nodes.append(NodeSpec(i, frm_t, "Focus", 1, (c2, k), c2))
            st = in_stride(frm_t[0]) * 2
        elif mod == "GhostConv":
            c2 = make_divisible(min(args[0], max_channels) * width)
            k = args[1] if len(args) > 1 else 1
            s = args[2] if len(args) > 2 else 1
            nodes.append(NodeSpec(i, frm_t, "GhostConv", 1, (c2, k, s), c2))
            st = in_stride(frm_t[0]) * s
        elif mod == "DWConv":
            c2 = make_divisible(min(args[0], max_channels) * width)
            k = args[1] if len(args) > 1 else 1
            s = args[2] if len(args) > 2 else 1
            act = args[4] if len(args) > 4 else True
            nodes.append(NodeSpec(i, frm_t, "DWConv", 1, (c2, k, s, act), c2))
            st = (in_stride(frm_t[0]) if node_stride else 1) * s
        elif mod in ("C2f", "C3"):
            c2 = make_divisible(min(args[0], max_channels) * width)
            shortcut = bool(args[1]) if len(args) > 1 else (mod == "C3")
            nodes.append(NodeSpec(i, frm_t, mod, n_rep, (c2, shortcut), c2))
            st = in_stride(frm_t[0]) if node_stride else 1
        elif mod == "RepConv":
            # n chained re-param convs (YOLO-NAS QSP/QCI stage shape)
            c2 = make_divisible(min(args[0], max_channels) * width)
            nodes.append(NodeSpec(i, frm_t, "RepConv", n_rep, (c2,), c2))
            st = in_stride(frm_t[0])
        elif mod == "RepC3":
            c2 = make_divisible(min(args[0], max_channels) * width)
            nodes.append(NodeSpec(i, frm_t, "RepC3", n_rep, (c2,), c2))
            st = in_stride(frm_t[0])
        elif mod == "HGStem":
            cm = make_divisible(min(args[0], max_channels) * width)
            c2 = make_divisible(min(args[1], max_channels) * width)
            nodes.append(NodeSpec(i, frm_t, "HGStem", 1, (cm, c2), c2))
            st = (in_stride(frm_t[0]) if node_stride else 1) * 4
        elif mod == "HGBlock":
            cm = make_divisible(min(args[0], max_channels) * width)
            c2 = make_divisible(min(args[1], max_channels) * width)
            k = args[2] if len(args) > 2 else 3
            light = bool(args[3]) if len(args) > 3 else False
            shortcut = bool(args[4]) if len(args) > 4 else False
            nodes.append(NodeSpec(i, frm_t, "HGBlock", n_rep,
                                  (cm, c2, k, light, shortcut), c2))
            st = in_stride(frm_t[0])
        elif mod == "AIFI":
            c2 = in_ch(frm_t[0])
            cm = args[0] if args else 2048
            heads = args[1] if len(args) > 1 else 8
            nodes.append(NodeSpec(i, frm_t, "AIFI", 1, (cm, heads), c2))
            st = in_stride(frm_t[0])
        elif mod == "SPPF":
            c2 = make_divisible(min(args[0], max_channels) * width)
            k = args[1] if len(args) > 1 else 5
            nodes.append(NodeSpec(i, frm_t, "SPPF", 1, (c2, k), c2))
            st = in_stride(frm_t[0])
        elif mod == "Bottleneck":
            # bare Bottleneck rows (v3 graphs): n sequential blocks, the
            # reference wraps them in nn.Sequential (`tasks.py:940-942`)
            c2 = make_divisible(min(args[0], max_channels) * width)
            shortcut = bool(args[1]) if len(args) > 1 else True
            nodes.append(NodeSpec(i, frm_t, "Bottleneck", n_rep,
                                  (c2, shortcut), c2))
            st = in_stride(frm_t[0])
        elif mod == "SPP":
            c2 = make_divisible(min(args[0], max_channels) * width)
            ks = tuple(args[1]) if len(args) > 1 else (5, 9, 13)
            nodes.append(NodeSpec(i, frm_t, "SPP", 1, (c2, ks), c2))
            st = in_stride(frm_t[0])
        elif mod == "nn.MaxPool2d":
            # raw torch layer rows (v3-tiny): (kernel, stride, padding)
            k = args[0] if args else 2
            s = args[1] if len(args) > 1 else k
            p = args[2] if len(args) > 2 else 0
            c2 = in_ch(frm_t[0])
            nodes.append(NodeSpec(i, frm_t, "MaxPool2d", 1, (k, s, p), c2))
            st = in_stride(frm_t[0]) * s
        elif mod == "nn.ZeroPad2d":
            pad = args[0] if args else 0  # (left, right, top, bottom)|int
            pad = tuple(pad) if isinstance(pad, (list, tuple)) else (pad,) * 4
            c2 = in_ch(frm_t[0])
            nodes.append(NodeSpec(i, frm_t, "ZeroPad2d", 1, (pad,), c2))
            st = in_stride(frm_t[0])
        elif mod == "nn.ConvTranspose2d":
            # raw (bias, no BN/act) transposed conv (v6 head); c2 is
            # width-scaled like any conv (`tasks.py:905-918`)
            c2 = make_divisible(min(args[0], max_channels) * width)
            k = args[1] if len(args) > 1 else 2
            s = args[2] if len(args) > 2 else 2
            p = args[3] if len(args) > 3 else 0
            if p != 0:
                raise ValueError("nn.ConvTranspose2d: only padding=0 is "
                                 "supported (all shipped graphs use 0)")
            nodes.append(NodeSpec(i, frm_t, "ConvTranspose2dRaw", 1,
                                  (c2, k, s), c2))
            st = max(in_stride(frm_t[0]) // s, 1)
        elif mod in ("nn.Upsample", "Upsample"):
            c2 = in_ch(frm_t[0])
            nodes.append(NodeSpec(i, frm_t, "Upsample", 1, (), c2))
            st = in_stride(frm_t[0]) // 2
        elif mod == "Concat":
            c2 = sum(in_ch(f) for f in frm_t)
            nodes.append(NodeSpec(i, frm_t, "Concat", 1, (), c2))
            st = in_stride(frm_t[0])
        else:
            raise ValueError(f"unsupported module in yaml graph: {mod}")
        ch.append(c2)
        node_stride.append(st)

    if default_act is not True:
        # the override is threaded through Conv rows, SPPF, and the
        # Detect head (all the shipped v6 graphs need); refuse silently
        # mixed-activation networks for anything else
        ok = {"Conv", "SPPF", "MaxPool2d", "ZeroPad2d",
              "ConvTranspose2dRaw", "Upsample", "Concat"}
        bad = sorted({n.module for n in nodes} - ok)
        head_m = head_row[1] if head_row else None
        if bad or head_m != "Detect":
            raise ValueError(
                f"activation override {cfg.get('activation')!r} is only "
                f"supported for Conv/SPPF graphs with a Detect head "
                f"(unsupported: {bad or head_m}) — the reference rebinds "
                f"Conv.default_act globally, tasks.py:887-899")
    if head_row is None:
        raise ValueError("model yaml has no head row (Detect/MOTRTrack/...)")
    frm_t, head_mod, head_args = head_row
    if head_mod == "Segment" and len(head_args) >= 3:
        # reference parse_model width-scales the proto channels (npr,
        # args[2]) like any other channel count (`nn/tasks.py` Segment arm)
        head_args = (head_args[0], head_args[1],
                     make_divisible(min(head_args[2], max_channels) * width))
    out_idx = tuple(frm_t)
    out_ch = tuple(ch[f + 1] for f in out_idx)
    out_st = tuple(node_stride[f] for f in out_idx)
    return GraphSpec(tuple(nodes), out_idx, out_ch, out_st, nc, head_mod,
                     head_args, act=default_act)


class BackboneNeck(nn.Module):
    """Executes the parsed CNN graph and returns the head's feature taps.

    For `yolo_track.yaml` this is the YOLOv8-l backbone (rows 0-9) + PAN neck
    (rows 10-21), returning (P3, P4, P5) NHWC features at strides 8/16/32.
    """

    spec: GraphSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, upto: Optional[int] = None):
        # `upto`: stop after node `upto` and return its output — the
        # prefix hook the per-layer profiler (reference
        # `BaseModel._profile_one_layer`, `nn/tasks.py:97-120`) jits
        # growing graph prefixes with.
        # which intermediate outputs must be cached
        needed = set(self.spec.out_indices)
        for node in self.spec.nodes:
            for f in node.frm:
                if f >= 0:
                    needed.add(f)
        outputs: Dict[int, jnp.ndarray] = {}
        prev = x
        for node in self.spec.nodes:
            ins = [prev if f == -1 else outputs[f] for f in node.frm]
            if node.module == "Conv":
                c2, k, s, act, p = (node.args if len(node.args) == 5
                                    else (*node.args, None))
                y = ins[0]
                for r in range(node.repeats):
                    nm = (f"n{node.index}" if node.repeats == 1
                          else f"n{node.index}_{r}")
                    y = ConvBnAct(c2, k, s, act=act, padding=p,
                                  dtype=self.dtype, name=nm)(y, train)
            elif node.module == "ConvTranspose":
                c2, k, s = node.args
                y = ConvTranspose(c2, k, s, dtype=self.dtype,
                                  name=f"n{node.index}")(ins[0], train)
            elif node.module == "Focus":
                c2, k = node.args
                y = Focus(c2, k, dtype=self.dtype,
                          name=f"n{node.index}")(ins[0], train)
            elif node.module == "GhostConv":
                c2, k, s = node.args
                y = GhostConv(c2, k, s, dtype=self.dtype,
                              name=f"n{node.index}")(ins[0], train)
            elif node.module == "DWConv":
                c2, k, s, act = node.args
                y = DWConv(c2, k, s, act=act, dtype=self.dtype,
                           name=f"n{node.index}")(ins[0], train)
            elif node.module == "C2f":
                c2, shortcut = node.args
                y = C2f(c2, node.repeats, shortcut, dtype=self.dtype,
                        name=f"n{node.index}")(ins[0], train)
            elif node.module == "C3":
                c2, shortcut = node.args
                y = C3(c2, node.repeats, shortcut, dtype=self.dtype,
                       name=f"n{node.index}")(ins[0], train)
            elif node.module == "RepConv":
                y = ins[0]
                for r in range(node.repeats):
                    y = RepConv(node.args[0], dtype=self.dtype,
                                name=f"n{node.index}_{r}")(y, train)
            elif node.module == "RepC3":
                y = RepC3(node.args[0], node.repeats, dtype=self.dtype,
                          name=f"n{node.index}")(ins[0], train)
            elif node.module == "HGStem":
                cm, c2 = node.args
                y = HGStem(cm, c2, dtype=self.dtype,
                           name=f"n{node.index}")(ins[0], train)
            elif node.module == "HGBlock":
                cm, c2, k, light, shortcut = node.args
                y = HGBlock(cm, c2, k, node.repeats, light, shortcut,
                            dtype=self.dtype, name=f"n{node.index}")(ins[0],
                                                                     train)
            elif node.module == "AIFI":
                cm, heads = node.args
                y = AIFI(cm, heads, dtype=self.dtype,
                         name=f"n{node.index}")(ins[0], train)
            elif node.module == "SPPF":
                c2, k = node.args
                y = SPPF(c2, k, act=self.spec.act, dtype=self.dtype,
                         name=f"n{node.index}")(ins[0], train)
            elif node.module == "Bottleneck":
                # torch naming: bare module at n==1, nn.Sequential of
                # repeats otherwise — mirror it so imports map 1:1
                y = ins[0]
                for r in range(node.repeats):
                    nm = (f"n{node.index}" if node.repeats == 1
                          else f"n{node.index}_{r}")
                    y = Bottleneck(node.args[0], node.args[1],
                                   dtype=self.dtype, name=nm)(y, train)
            elif node.module == "SPP":
                c2, ks = node.args
                y = SPP(c2, ks, dtype=self.dtype,
                        name=f"n{node.index}")(ins[0], train)
            elif node.module == "MaxPool2d":
                k, s, p = node.args
                y = nn.max_pool(ins[0], (k, k), strides=(s, s),
                                padding=((p, p), (p, p)))
            elif node.module == "ZeroPad2d":
                left, right, top, bottom = node.args[0]
                y = jnp.pad(ins[0], ((0, 0), (top, bottom),
                                     (left, right), (0, 0)))
            elif node.module == "ConvTranspose2dRaw":
                c2, k, s = node.args
                y = nn.ConvTranspose(c2, (k, k), strides=(s, s),
                                     padding="VALID", dtype=self.dtype,
                                     name=f"n{node.index}")(ins[0])
            elif node.module == "Upsample":
                y = upsample2x(ins[0])
            elif node.module == "Concat":
                y = concat(ins)
            else:  # pragma: no cover
                raise AssertionError(node.module)
            if node.index in needed:
                outputs[node.index] = y
            prev = y
            if upto is not None and node.index >= upto:
                return y
        return tuple(outputs[i] for i in self.spec.out_indices)
