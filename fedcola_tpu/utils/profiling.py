"""Profiling hooks (SURVEY.md §5: the reference has none; the rebuild adds
``jax.profiler`` traces + per-round wall-clock, since BASELINE.md's metrics
are samples/sec/chip and per-round time)."""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def round_trace(enabled: bool, log_dir: str, round_idx: int):
    """Capture a jax profiler trace for one round when enabled."""
    if not enabled:
        yield
        return
    import jax
    path = os.path.join(log_dir, f"trace_round{round_idx:04d}")
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield
    logger.info("profiler trace written to %s", path)


class Timer:
    """Accumulating section timer for the round loop."""

    def __init__(self):
        self.sections = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            # record partial time even when the body raises (a caught
            # exception upstream would otherwise lose the section)
            self.sections[name] = self.sections.get(name, 0.0) \
                + time.perf_counter() - t0

    def summary(self) -> str:
        total = sum(self.sections.values())
        parts = " ".join(f"{k}={v:.2f}s" for k, v in self.sections.items())
        return f"{parts} total={total:.2f}s"
