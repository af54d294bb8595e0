"""Weight-initialisation variants (reference ``init_weights``,
src/utils.py:126-163).

The reference applies these via the legacy ``load_model`` path only — the
MAT keeps torch defaults (its ``init_weights`` call site is the dormant
model loader, SURVEY.md §2.3 M10) — so this is an available utility, not
part of MAT construction.  Semantics per torch:

* applies to Linear/Conv *kernels* (ours: ``*_kernel`` / ``patch_kernel`` /
  head ``kernel`` leaves); their biases are zeroed; embeddings, LayerNorms
  and cls/pos tokens are untouched (torch's init_func matches only
  Linear/Conv/BatchNorm module classes);
* fan computation follows torch's [out, in] convention (our kernels are
  [in, out], stacked kernels [depth, in, out] are initialised per layer).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_KERNEL_SUFFIXES = ("_kernel",)
_KERNEL_NAMES = ("kernel", "patch_kernel")


def _is_kernel(path) -> bool:
    leaf = path[-1]
    return leaf in _KERNEL_NAMES or leaf.endswith(_KERNEL_SUFFIXES)


def _is_bias(path) -> bool:
    """Linear/Conv biases only: torch's ``init_func`` matches
    Linear/Conv/BatchNorm module classes, so LayerNorm biases
    (norm1_bias / norm2_bias / the shared norm / embedding LN) must stay
    untouched — zeroing them would silently wipe trained values on the
    legacy-load path."""
    leaf = path[-1]
    if "norm" in leaf or leaf.startswith("ln"):
        return False
    if any("norm" in str(p) for p in path[:-1]):
        return False
    return leaf in ("bias", "patch_bias") or leaf.endswith("_bias")


def _init_matrix(rng, shape, init_type: str, gain: float):
    """One [in, out] kernel.  fan_in/fan_out as torch sees them on the
    transposed [out, in] weight."""
    if len(shape) == 4:                      # [P, P, C, D] patch conv
        # torch _calculate_fan_in_and_fan_out on Conv2d [D, C, P, P]:
        # fan = fmaps * receptive_field, for BOTH directions
        fan_in = shape[2] * shape[0] * shape[1]
        fan_out = shape[3] * shape[0] * shape[1]
    else:
        fan_in, fan_out = shape[-2], shape[-1]
    if init_type == "normal":
        return gain * jax.random.normal(rng, shape)
    if init_type == "xavier":
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(rng, shape)
    if init_type == "xavier_uniform":
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(rng, shape, minval=-bound, maxval=bound)
    if init_type == "kaiming":
        # torch kaiming_normal_(a=0, mode='fan_in'): std = sqrt(2/fan_in)
        return math.sqrt(2.0 / fan_in) * jax.random.normal(rng, shape)
    if init_type == "truncnorm":
        # torch trunc_normal_(std=gain, a=-2, b=2): ABSOLUTE bounds +-2
        lo, hi = -2.0 / max(gain, 1e-12), 2.0 / max(gain, 1e-12)
        return gain * jax.random.truncated_normal(rng, lo, hi, shape)
    if init_type == "orthogonal":
        flat = (int(jnp.prod(jnp.asarray(shape[:-1]))), shape[-1])
        a = jax.random.normal(rng, flat)
        q, r = jnp.linalg.qr(a if flat[0] >= flat[1] else a.T)
        q = q * jnp.sign(jnp.diagonal(r))[None, :]
        if flat[0] < flat[1]:
            q = q.T
        return gain * q.reshape(shape)
    if init_type == "none":
        return None                          # keep torch-default init
    raise NotImplementedError(
        f"[ERROR] Initialization method {init_type} is not implemented!")


def init_weights(params, init_type: str, init_gain: float, rng):
    """Re-initialise Linear/Conv kernels of a MAT pytree; zero their biases.
    Returns a new pytree (``init_type='none'`` returns it unchanged)."""
    if init_type == "none":
        return params

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, len(flat))
    out = []
    for (path, leaf), k in zip(flat, keys):
        names = tuple(getattr(p, "key", str(p)) for p in path)
        if _is_kernel(names):
            if leaf.ndim >= 3 and names[-1] != "patch_kernel":
                # stacked [depth, in, out]: per-layer init like per-module
                # torch init
                ks = jax.random.split(k, leaf.shape[0])
                new = jnp.stack([
                    _init_matrix(ks[i], leaf.shape[1:], init_type, init_gain)
                    for i in range(leaf.shape[0])])
            else:
                new = _init_matrix(k, leaf.shape, init_type, init_gain)
            out.append(new.astype(leaf.dtype))
        elif _is_bias(names):
            out.append(jnp.zeros_like(leaf))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
