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
import platform
import subprocess

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))


def _host_tag() -> str:
    """Host/ISA fingerprint for the build cache: sources are compiled with
    ``-march=native``, so a .so built on one machine must never be dlopen'd
    on another (SIGILL risk on CPUs lacking the build host's extensions)."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo", encoding="utf-8", errors="replace") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(line.split(":", 1)[1].strip())
                    break
    except OSError:
        pass
    try:
        gxx = subprocess.run(["g++", "-dumpfullversion", "-dumpversion"],
                             capture_output=True, timeout=10, text=True)
        parts.append(gxx.stdout.strip())
    except Exception:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def build_library(src_name: str) -> str | None:
    """Compile ``src_name`` to a cached .so; returns path or None.  The
    cache name includes both the source digest and a host/ISA tag, and the
    cache files are gitignored (never committed binaries)."""
    src = os.path.join(_DIR, src_name)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_DIR, f".{src_name}.{digest}.{_host_tag()}.so")
    if os.path.exists(out):
        return out
    # compile to a private temp name and rename into place: a direct
    # write would leave a truncated .so on a timeout-killed compile (or
    # under concurrent multi-process builds), and os.path.exists() would
    # then trust the garbage file forever
    tmp = f"{out}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)   # atomic on POSIX
        return out
    except Exception as e:  # missing toolchain -> python fallback
        try:
            os.unlink(tmp)
        except OSError:
            pass
        logger.warning("native build of %s failed (%s); using python "
                       "fallback", src_name, e)
        return None
