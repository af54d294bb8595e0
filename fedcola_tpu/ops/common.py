"""Helpers shared by the fused Pallas kernel families
(``fused_attention.py`` / ``fused_mlp.py``) — one copy, so a numerics or
batching-rule fix cannot silently miss a sibling file."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-VMEM allocation check (~16 MB) rejects the
# backward kernels' f32 dW accumulators at base-class widths
# ([D,4D]+[4D,D] ~= 19 MB at D=768) even though v5e physically has
# 128 MB VMEM per core.  Raising the per-kernel limit unlocks those
# widths; 96 MB (~3.5x the D=768 bill) leaves Mosaic room to keep
# double-buffering — measured on the real chip (scripts/
# vmem_limit_probe3.py): the D=768 MLP backward runs 131.8 TF/s
# incl-recompute at 96 MB vs 47.1 TF/s at a bare-minimum 32 MB vs
# Mosaic allocation FAILURE at the default.
_WIDE_VMEM_LIMIT = int(os.environ.get(
    "FEDCOLA_WIDE_VMEM_LIMIT_MB", 96)) * 1024 * 1024
# experiment knob (scripts/perf_sweep.py): force the raised limit at
# EVERY width, letting the per-kernel item budgets (FEDCOLA_MLP_VMEM
# etc.) sweep past Mosaic's default check at ViT-small shapes too.
# Parsed once at import (like _WIDE_VMEM_LIMIT) so a malformed value
# fails here with context, not mid-trace; unset/empty/0 disables.
_FORCED_VMEM_LIMIT = (
    int(os.environ.get("FEDCOLA_VMEM_LIMIT_MB") or 0) * 1024 * 1024) or None


def wide_compiler_params(embed_dim: int):
    """``compiler_params`` for a fused-kernel ``pallas_call``: None for
    ViT-small-class widths (the tuned regime keeps Mosaic's default
    VMEM accounting), a raised ``vmem_limit_bytes`` above D=512 where
    the dW accumulators outgrow the default check."""
    if _FORCED_VMEM_LIMIT:
        return pltpu.CompilerParams(vmem_limit_bytes=_FORCED_VMEM_LIMIT)
    if embed_dim <= 512:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_WIDE_VMEM_LIMIT)


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
