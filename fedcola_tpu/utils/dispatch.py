"""Windowed dispatch-ahead for device->host readback loops.

jax dispatch is asynchronous: an eval loop that does a per-batch
``np.asarray`` caps the device pipeline at one program deep, while
unbounded dispatch pins every in-flight batch's input/output buffers in
HBM at once.  ``DispatchWindow`` bounds the number of dispatched-but-
unread batches: ``push`` enqueues a batch's device outputs and drains the
oldest one once the window is full, ``flush`` drains the rest.

Shared by retrieval feature extraction, central eval, and the serial
local-eval path (the reference has no analog — its DataLoader eval loops
are synchronous per batch, fedavgclient.py:60-75).
"""

from __future__ import annotations

import os
from collections import deque
from typing import Callable

import numpy as np

# max batches dispatched ahead of the host readback
EVAL_INFLIGHT = max(1, int(os.environ.get("FEDCOLA_EVAL_INFLIGHT", 8)))


def pad_batch_indices(idx, B: int):
    """Pad a partial batch's index vector to the fixed batch size ``B`` by
    repeating the first row (fixed shapes keep one compiled program per
    batch size; readers trim the readback with ``[:len(idx)]``).  The one
    pad/trim contract shared by central eval, serial local eval, retrieval
    feature extraction, and the CreamFL pub batches."""
    if len(idx) == 0:
        raise ValueError("pad_batch_indices needs a non-empty index vector "
                         "(there is no row to repeat as padding)")
    pad = B - len(idx)
    if pad <= 0:
        return idx
    return np.concatenate([idx, np.repeat(idx[:1], pad)])


class DispatchWindow:
    """Bounded dispatch-ahead queue.

    ``drain`` is called with one pushed item at a time, in FIFO order;
    at most ``inflight`` batches are dispatched-but-unread at any moment
    (the drained batch is still in flight while its readback blocks).
    """

    def __init__(self, drain: Callable, inflight: int | None = None):
        self._drain = drain
        self._inflight = EVAL_INFLIGHT if inflight is None else max(1,
                                                                    inflight)
        self._q: deque = deque()

    def push(self, *item) -> None:
        self._q.append(item)
        if len(self._q) >= self._inflight:
            self._drain(*self._q.popleft())

    def flush(self) -> None:
        while self._q:
            self._drain(*self._q.popleft())
