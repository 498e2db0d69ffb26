"""Persisted user settings (reference `SETTINGS`,
`ultralytics/utils/__init__.py:716-797`): a small yaml-backed dict at
~/.config/mo_yolo_tpu/settings.yaml holding machine-level preferences —
dataset/weights/runs directories and integration toggles. Version-keyed:
a defaults-schema change resets unknown/missing keys while preserving the
user's values for keys that still exist.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict

import yaml

SETTINGS_VERSION = "0.1.0"

_DEFAULTS: Dict[str, Any] = {
    "settings_version": SETTINGS_VERSION,
    "datasets_dir": str(Path.home() / "datasets"),
    "weights_dir": str(Path.home() / "weights"),
    "runs_dir": "runs",
    "tensorboard": True,
    "mlflow": True,
    "wandb": True,
    "comet": True,
    "clearml": True,
    "neptune": True,
    "dvc": True,
    "raytune": True,
    "hub": True,
    "sync": False,
}


def settings_path() -> Path:
    base = os.environ.get("MO_YOLO_TPU_CONFIG_DIR",
                          str(Path.home() / ".config" / "mo_yolo_tpu"))
    return Path(base) / "settings.yaml"


class Settings(dict):
    """dict with attribute access + explicit save/reset (reference
    `SettingsManager`)."""

    def __init__(self, path: Path | None = None):
        super().__init__()
        self.path = path or settings_path()
        self.update(_DEFAULTS)
        if self.path.is_file():
            try:
                with open(self.path) as f:
                    saved = yaml.safe_load(f) or {}
            except Exception:
                saved = {}
            if saved.get("settings_version") == SETTINGS_VERSION:
                for k in _DEFAULTS:
                    if k in saved:
                        self[k] = saved[k]
            else:  # schema change: keep surviving keys, rewrite the file
                for k in _DEFAULTS:
                    if k in saved and k != "settings_version":
                        self[k] = saved[k]
                self.save()

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    def update(self, *a, **kw):
        bad = [k for k in dict(*a, **kw) if k not in _DEFAULTS]
        if bad:
            raise KeyError(f"unknown settings key(s) {bad}; valid: "
                           f"{sorted(_DEFAULTS)}")
        super().update(*a, **kw)

    def save(self):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "w") as f:
            yaml.safe_dump(dict(self), f, sort_keys=False)

    def reset(self):
        self.clear()
        super().update(_DEFAULTS)
        self.save()


def load_settings() -> Settings:
    return Settings()
