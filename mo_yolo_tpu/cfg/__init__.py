"""Config loading and validation.

Equivalent of the reference `get_cfg` (`cfg/__init__.py:98-148`): merge
default.yaml with user overrides, with type checking and helpful errors on
unknown keys (the CLI layer in `mo_yolo_tpu.cli` parses `k=v` pairs into
overrides, mirroring the `yolo task mode k=v` entrypoint).
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, Optional, Union

import yaml

DEFAULT_CFG_PATH = Path(__file__).resolve().parent / "default.yaml"


def load_default() -> Dict[str, Any]:
    with open(DEFAULT_CFG_PATH) as f:
        return yaml.safe_load(f)


def get_cfg(overrides: Optional[Dict[str, Any]] = None,
            cfg: Union[str, Dict, None] = None) -> SimpleNamespace:
    """Merge defaults <- optional cfg file/dict <- overrides, validated."""
    base = load_default()
    if cfg is not None:
        if isinstance(cfg, (str, Path)):
            with open(cfg) as f:
                cfg = yaml.safe_load(f)
        base.update(cfg or {})
    for k, v in (overrides or {}).items():
        if k not in base:
            close = [b for b in base if k.lower() in b.lower() or
                     b.lower() in k.lower()]
            hint = f" (did you mean {close[0]!r}?)" if close else ""
            raise KeyError(f"unknown config key {k!r}{hint}")
        dv = base[k]
        if dv is not None and v is not None and not isinstance(v, type(dv)):
            # allow int -> float promotion and str for paths
            if isinstance(dv, float) and isinstance(v, int):
                v = float(v)
            elif isinstance(dv, bool) and isinstance(v, str):
                v = v.lower() == "true"
            elif not isinstance(dv, str):
                raise TypeError(
                    f"config key {k!r} expects {type(dv).__name__}, "
                    f"got {type(v).__name__} ({v!r})")
        base[k] = v
    return SimpleNamespace(**base)
