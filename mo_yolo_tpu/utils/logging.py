"""Global logger (reference `utils/__init__.py:207-250` LOGGER)."""

import logging
import os

LOGGER = logging.getLogger("mo_yolo_tpu")
if not LOGGER.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(_h)
    LOGGER.setLevel(logging.DEBUG if os.environ.get("MO_YOLO_VERBOSE")
                    else logging.INFO)
    LOGGER.propagate = False
