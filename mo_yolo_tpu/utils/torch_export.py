"""Reference-format `.pt` checkpoint export (torch interop, outbound).

`load_torch` imports reference weights INTO the JAX stack
(`utils/checkpoint.py:apply_torch_state_dict`); this module is the
outbound direction: render a trained model as a checkpoint the reference
torch stack can consume, so a user can train here and deploy with their
existing torch tooling.

The artifact mirrors the reference trainer's checkpoint dict
(`ultralytics/engine/trainer.py:424-488`: epoch / best_fitness / model /
train_args / date / version) with two deliberate differences:

  * `state_dict` is always present (reference-layout tensor names from
    `export_torch_state_dict`, the strict inverse of the import mapping)
    — loadable with plain `module.load_state_dict(...)`, no unpickling
    of framework classes required;
  * `model` (the reference's pickled full module) is included only when
    the reference `ultralytics` package is importable in the current
    environment and the module builds + loads cleanly; otherwise it is
    None and a warning names the fallback. The reference's own
    `TrackingModel` head is unbuildable as shipped without grafting a
    `MOTR.datasets` package in (SURVEY.md "reference quality warning"),
    so state_dict-only is the common case outside a patched env.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Any, Dict, Optional

from mo_yolo_tpu.utils.logging import LOGGER


def build_reference_module(cfg_path: str, task: str = "track"):
    """Construct the reference torch model for `cfg_path` (requires the
    reference `ultralytics` package importable). Raises on failure."""
    from ultralytics.nn import tasks

    if task == "track":
        # MOTRTrack.__init__ calls argparse.parse_args() on live sys.argv
        # (reference head.py:108-111) — pin it for the construction
        argv = sys.argv
        sys.argv = ["motr"]
        try:
            module = tasks.TrackingModel(cfg=cfg_path, verbose=False)
        finally:
            sys.argv = argv
    elif task == "detect":
        module = tasks.DetectionModel(cfg=cfg_path, verbose=False)
    elif task == "segment":
        module = tasks.SegmentationModel(cfg=cfg_path, verbose=False)
    elif task == "pose":
        module = tasks.PoseModel(cfg=cfg_path, verbose=False)
    elif task == "classify":
        module = tasks.ClassificationModel(cfg=cfg_path, verbose=False)
    else:
        raise ValueError(f"unsupported task for torch export: {task!r}")
    return module.eval().float()


def export_torchscript(variables: Dict[str, Any], path: str,
                       cfg_path: str, head_idx: int,
                       imgsz, task: str = "detect",
                       names: Optional[Dict[int, str]] = None,
                       half: bool = False, optimize: bool = False) -> str:
    """TorchScript export (the reference's first-listed format,
    `engine/exporter.py:export_torchscript`): build the reference torch
    module for `cfg_path`, land our weights in it strictly, trace, and
    save with the reference's `config.txt` metadata sidecar.

    Requires the reference `ultralytics` package importable and a
    reference-parseable model yaml; raises a clear error otherwise (the
    TPU-side serving formats — jaxexport/saved_model/tflite — need
    neither)."""
    import json

    import numpy as np
    import torch

    from mo_yolo_tpu.data.letterbox import to_hw
    from mo_yolo_tpu.utils.checkpoint import export_torch_state_dict

    try:
        module = build_reference_module(cfg_path, task=task)
    except Exception as e:
        raise RuntimeError(
            "torchscript export needs the reference ultralytics package "
            f"and a reference-parseable yaml ({cfg_path!r}): "
            f"{type(e).__name__}: {e}") from e
    sd = export_torch_state_dict(variables, head_idx=head_idx)
    tsd = {k: torch.from_numpy(np.array(v, copy=True))
           for k, v in sd.items()}
    missing, unexpected = module.load_state_dict(tsd, strict=False)
    if unexpected:
        raise RuntimeError(
            f"{len(unexpected)} exported tensors have no home in the "
            f"reference module (first: {unexpected[:3]})")
    not_dfl = [k for k in missing if ".dfl." not in k]
    if not_dfl:
        raise RuntimeError(
            f"torch module tensors not covered by the export (first: "
            f"{not_dfl[:3]}) — torchscript would ship random weights")
    if half:
        module = module.half()
    h, w = to_hw(imgsz)
    example = torch.zeros(1, 3, h, w,
                          dtype=torch.half if half else torch.float32)
    with torch.no_grad():
        # warm-up: the Detect head lazily caches anchors on first call
        # (`head.py:56`), so trace and its sanity re-run must both see
        # the cached path (the reference exporter dry-runs before
        # tracing for the same reason, `exporter.py:146-150`)
        for _ in range(2):
            module(example)
        ts = torch.jit.trace(module, example, strict=False)
    out = Path(path).with_suffix(".torchscript")
    out.parent.mkdir(parents=True, exist_ok=True)
    # reference metadata sidecar (`exporter.py`: config.txt in the zip)
    meta = {"imgsz": [h, w], "names": names or {}, "task": task,
            "stride": 32, "half": bool(half)}
    extra = {"config.txt": json.dumps(meta)}
    if optimize:  # reference `optimize=True`: mobile-optimized artifact
        from torch.utils.mobile_optimizer import optimize_for_mobile
        optimize_for_mobile(ts)._save_for_lite_interpreter(
            str(out), _extra_files=extra)
    else:
        ts.save(str(out), _extra_files=extra)
    return str(out)


def export_reference_pt(variables: Dict[str, Any], path: str,
                        train_args: Dict[str, Any],
                        head_idx: int = 22, task: str = "track",
                        half: bool = False,
                        build_module: bool = True,
                        module_cfg: Optional[str] = None) -> str:
    """Write a reference-format `.pt` checkpoint for `variables`.

    Returns the written path. `module_cfg` overrides the yaml used for
    the full-module build (defaults to `train_args['model']`)."""
    import datetime

    import numpy as np
    import torch

    from mo_yolo_tpu.utils.checkpoint import export_torch_state_dict

    sd = export_torch_state_dict(variables, head_idx=head_idx)
    tsd = {k: torch.from_numpy(np.array(v, copy=True))
           for k, v in sd.items()}

    module = None
    if build_module:
        cfg = module_cfg or train_args.get("model")
        try:
            module = build_reference_module(cfg, task=task)
            missing, unexpected = module.load_state_dict(tsd, strict=False)
            if unexpected:
                raise RuntimeError(
                    f"{len(unexpected)} exported tensors have no home in "
                    f"the reference module (first: {unexpected[:3]})")
            # missing keys are the reference's dead modules (never
            # executed on the eval path; documented at
            # utils/checkpoint.py import-coverage notes) — tolerated.
            if missing:
                LOGGER.info(f"pt export: {len(missing)} reference-side "
                            "dead-module tensors left at init (e.g. "
                            f"{missing[0]})")
            if half:
                module = module.half()
        except Exception as e:  # pragma: no cover - env-dependent
            LOGGER.warning(
                "pt export: reference module not buildable here "
                f"({type(e).__name__}: {e}); writing state_dict-only "
                "checkpoint (load with module.load_state_dict("
                "torch.load(p)['state_dict']))")
            module = None

    out = Path(path).with_suffix(".pt")
    out.parent.mkdir(parents=True, exist_ok=True)
    torch.save({
        "epoch": -1,
        "best_fitness": None,
        "model": module,
        "state_dict": tsd,
        "train_args": dict(train_args),
        "date": datetime.datetime.now().isoformat(),
        "version": "mo-yolo-tpu",
    }, str(out))
    return str(out)
