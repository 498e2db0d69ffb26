"""API-key auth (reference `hub/auth.py`): key from argument, env, or the
settings file; no interactive browser flow (headless TPU hosts)."""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

SETTINGS_FILE = Path(os.environ.get(
    "MO_YOLO_SETTINGS", str(Path.home() / ".mo_yolo_tpu" / "settings.json")))


def _load_settings() -> dict:
    try:
        return json.loads(SETTINGS_FILE.read_text())
    except (OSError, ValueError):
        return {}


def _save_settings(s: dict):
    SETTINGS_FILE.parent.mkdir(parents=True, exist_ok=True)
    SETTINGS_FILE.write_text(json.dumps(s, indent=2))


class Auth:
    """Resolution order: explicit key > MO_YOLO_API_KEY env > settings
    file (reference auth.py:30-60 mirrors this with its web prompts)."""

    def __init__(self, api_key: Optional[str] = None):
        self.api_key = (api_key or os.environ.get("MO_YOLO_API_KEY") or
                        _load_settings().get("api_key") or "")

    @property
    def authenticated(self) -> bool:
        return bool(self.api_key)

    def persist(self):
        s = _load_settings()
        s["api_key"] = self.api_key
        _save_settings(s)


def login(api_key: str = "") -> Auth:
    """Store the key for future sessions (reference `hub/__init__.py:11`)."""
    a = Auth(api_key)
    if not a.authenticated:
        raise ValueError("no API key: pass login(api_key=...) or set "
                         "MO_YOLO_API_KEY")
    a.persist()
    return a


def logout():
    """Remove the stored key (reference `hub/__init__.py:25`)."""
    s = _load_settings()
    s.pop("api_key", None)
    _save_settings(s)
