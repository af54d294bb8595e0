"""Deterministic seeding (reference ``set_seed``, src/utils.py:35-46).

The reference seeds torch/numpy/random globally and flips cuDNN into
deterministic mode.  JAX RNG is explicit, so here we seed the host-side
RNG streams (python ``random`` for client sampling, a ``RandomState`` for
splits/shuffles) and return the root jax key; device computation is
deterministic by construction.
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)
