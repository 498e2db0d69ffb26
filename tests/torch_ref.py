"""Shim-loader for the PyTorch reference tree (numeric-parity oracle).

The reference at /root/reference imports `pkg_resources`, `torchvision`
and the compiled `MultiScaleDeformableAttention` CUDA extension, none of
which exist in this environment. This module installs minimal stubs for
exactly the attributes touched during import (verified by walking the
import chain), adds the reference root to sys.path, and exposes
`load_reference()` returning the live reference modules.

The stubs are import-shims only — every numeric comparison in
tests/test_torch_parity.py runs through the reference's REAL module code
(`ultralytics/nn/modules/{transformer,head}.py`), not the stubs.
"""

from __future__ import annotations

import sys
import types

_REFERENCE_ROOT = "/root/reference"
_cache = None


def _mod(name, **attrs):
    m = types.ModuleType(name)
    m.__path__ = []          # mark as package so submodule imports resolve
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _install_stubs():
    import torch

    if "pkg_resources" not in sys.modules:
        pr = types.ModuleType("pkg_resources")
        pr.parse_version = lambda v: tuple(
            int(x) for x in str(v).split(".")[:3] if x.isdigit())
        sys.modules["pkg_resources"] = pr

    if "torchvision" in sys.modules:
        return

    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def nms(boxes, scores, iou_thres):
        keep = []
        idx = scores.argsort(descending=True)
        while idx.numel():
            i = idx[0]
            keep.append(int(i))
            if idx.numel() == 1:
                break
            xy1 = torch.maximum(boxes[i, :2], boxes[idx[1:], :2])
            xy2 = torch.minimum(boxes[i, 2:], boxes[idx[1:], 2:])
            inter = (xy2 - xy1).clamp(0).prod(1)
            v = inter / (box_area(boxes[i][None]) +
                         box_area(boxes[idx[1:]]) - inter)
            idx = idx[1:][v <= iou_thres]
        return torch.tensor(keep, dtype=torch.long)

    class IntermediateLayerGetter(torch.nn.ModuleDict):
        def __init__(self, model, return_layers):
            super().__init__()

    class ImageFolder(torch.utils.data.Dataset):
        def __init__(self, *a, **k):
            self.samples = []
            self.root = a[0] if a else ""

    tv = _mod("torchvision", __version__="0.15.0")
    tv.ops = _mod("torchvision.ops", box_area=box_area, nms=nms)
    tv.ops.boxes = _mod("torchvision.ops.boxes", box_area=box_area, nms=nms)
    tv.ops.misc = _mod("torchvision.ops.misc",
                       FrozenBatchNorm2d=torch.nn.BatchNorm2d)
    tv.models = _mod("torchvision.models")
    tv.models._utils = _mod("torchvision.models._utils",
                            IntermediateLayerGetter=IntermediateLayerGetter)
    tv.transforms = _mod("torchvision.transforms", ToTensor=object)
    tv.transforms.functional = _mod("torchvision.transforms.functional")
    tv.datasets = _mod("torchvision.datasets", ImageFolder=ImageFolder)
    tv.utils = _mod("torchvision.utils")
    # compiled CUDA extension referenced by the vendored MOTR ops —
    # imported at module scope but only called on the (dead) CUDA path
    _mod("MultiScaleDeformableAttention")


def _install_motr_dataset_stubs():
    """`MOTRTrack.__init__` pulls `MOTR.main.get_args_parser`
    (`head.py:108`), and MOTR/main.py imports a `MOTR.datasets` package
    that does not exist in the reference tree at all — the head is
    unbuildable as shipped without these stubs."""
    if "MOTR.datasets" in sys.modules:
        return
    ds = _mod("MOTR.datasets", build_dataset=lambda *a, **k: None,
              get_coco_api_from_dataset=lambda *a, **k: None)
    ds.samplers = _mod("MOTR.datasets.samplers")
    ds.coco = _mod("MOTR.datasets.coco", build=lambda *a, **k: None)
    ds.coco_eval = _mod("MOTR.datasets.coco_eval", CocoEvaluator=object)
    ds.panoptic_eval = _mod("MOTR.datasets.panoptic_eval",
                            PanopticEvaluator=object)
    ds.data_prefetcher = _mod(
        "MOTR.datasets.data_prefetcher", data_prefetcher=object,
        data_dict_to_cuda=lambda *a, **k: None)
    import MOTR
    MOTR.datasets = ds


def build_tracking_model(cfg_path: str, seed: int = 0):
    """Construct the reference `TrackingModel` (backbone + MYDecoder +
    QIM) in eval/f32. Handles the argv-sensitive `parse_args()` call in
    `MOTRTrack.__init__` (head.py:111) by pinning sys.argv."""
    ns = load_reference()
    _install_motr_dataset_stubs()
    torch = ns.torch
    torch.manual_seed(seed)
    argv = sys.argv
    sys.argv = ["motr"]
    try:
        model = ns.tasks.TrackingModel(cfg=cfg_path, verbose=False)
    finally:
        sys.argv = argv
    return model.eval().float()


def load_reference():
    """Import and return the reference modules (cached).

    Returns a namespace with `torch`, `transformer` (nn.modules), `head`,
    `tasks`. Raises ImportError if the reference tree is unavailable —
    callers should `pytest.importorskip`-style skip on failure.
    """
    global _cache
    if _cache is not None:
        return _cache
    import torch

    _install_stubs()
    if _REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, _REFERENCE_ROOT)
    from ultralytics.nn import tasks
    from ultralytics.nn.modules import head, transformer

    ns = types.SimpleNamespace(torch=torch, transformer=transformer,
                               head=head, tasks=tasks)
    _cache = ns
    return ns
