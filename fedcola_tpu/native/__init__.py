"""Native (C++) host-runtime components, loaded via ctypes.

The TPU compute path is jax/XLA/Pallas; these are the host-side hot paths:
* ``wordpiece.cpp`` — multi-threaded batch WordPiece encoding (dataset
  tokenization at load time);

Shared objects are compiled on demand with g++ and cached next to the
sources; every native path has a pure-Python fallback, so missing
toolchains only cost speed, never correctness.
"""

from __future__ import annotations

import hashlib
import logging
import os
import subprocess

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))


def build_library(src_name: str) -> str | None:
    """Compile ``src_name`` to a cached .so; returns path or None."""
    src = os.path.join(_DIR, src_name)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_DIR, f".{src_name}.{digest}.so")
    if os.path.exists(out):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception as e:  # missing toolchain -> python fallback
        logger.warning("native build of %s failed (%s); using python "
                       "fallback", src_name, e)
        return None
