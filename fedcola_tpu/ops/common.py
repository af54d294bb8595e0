"""Helpers shared by the fused Pallas kernel families
(``fused_attention.py`` / ``fused_mlp.py``) — one copy, so a numerics or
batching-rule fix cannot silently miss a sibling file."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests run the same kernels)."""
    return jax.default_backend() != "tpu"


def batch_arg(a, batched, axis_size):
    """custom_vmap rule helper: broadcast unbatched operands onto the
    mapped axis so the kernel grid can treat every operand as [n, ...]."""
    if batched:
        return a
    return jnp.broadcast_to(a[None], (axis_size,) + a.shape)


def items_per_program(B: int, per_item: int, budget: int) -> int:
    """Largest divisor of ``B`` whose per-program VMEM bill
    (``ib * per_item`` bytes) stays under ``budget``.

    Amortises grid and MXU-pipeline overhead: more batch items per
    program = more independent small dots for Mosaic's scheduler to
    overlap with VPU work — the win for short sequences (N=40 text)."""
    best = 1
    for ib in range(2, B + 1):
        if B % ib == 0 and ib * per_item < budget:
            best = ib
    return best
