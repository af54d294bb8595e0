"""Persistent XLA compile cache, enabled the same way by every entry
point (main.py, bench.py, __graft_entry__.py, the dev scripts).

``jax.config.update`` rather than env vars: the image's sitecustomize
imports jax long before any of our code runs, so JAX_* env settings made
here would be too late.  Fully-unrolled production programs are expensive
to compile; cache entries survive across runs on the same machine.

CPU entries are keyed by a host-CPU-feature fingerprint: XLA:CPU AOT
executables bake in the compile host's ISA features (avx512 variants,
prefer-no-scatter, ...) and the cache key does NOT include them — loading
an entry produced on a different host warns "could lead to execution
errors such as SIGILL" and has been observed to SIGSEGV inside
``compilation_cache.get_executable_and_time``.  TPU entries are
device-compiled and stay shared at the top level."""

from __future__ import annotations

import hashlib
import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax
    base = cache_dir or os.path.join(_REPO_ROOT, ".jax-cache")
    if jax.default_backend() == "cpu":
        base = os.path.join(base, f"cpu-{_cpu_fingerprint()}")
    jax.config.update("jax_compilation_cache_dir", base)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
