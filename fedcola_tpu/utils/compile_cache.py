"""Persistent XLA compile cache, enabled the same way by every entry
point (main.py, bench.py, __graft_entry__.py, the dev scripts).

``jax.config.update`` rather than env vars: the image's sitecustomize
imports jax long before any of our code runs, so JAX_* env settings made
here would be too late.  Fully-unrolled production programs are expensive
to compile; cache entries survive across runs on the same machine."""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      cache_dir or os.path.join(_REPO_ROOT, ".jax-cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
