"""Logging bootstrap (reference ``set_logger``, src/__init__.py:13-42):
stream + file handlers with the same record format."""

from __future__ import annotations

import logging
import os
import sys


def set_logger(path: str | None = None, level=logging.INFO) -> logging.Logger:
    fmt = logging.Formatter(
        "%(asctime)s [%(levelname)s] %(message)s", "%m/%d %H:%M:%S")
    root = logging.getLogger("fedcola_tpu")
    root.setLevel(level)
    root.handlers.clear()
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(sh)
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fh = logging.FileHandler(path)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    return root
