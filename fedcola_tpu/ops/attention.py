"""Multi-head self-attention for the MAT transformer blocks.

Numerics follow the reference ``Attention.forward`` (reference
``src/models/mome.py:150-168``): scaled q, attention logits computed in
**float32** regardless of the activation dtype, softmax in float32, then cast
back to the activation dtype before the value matmul.  The reference never
passes a key-padding mask from the MAT forward (``mome.py:902-907`` runs
blocks through ``nn.Sequential`` which cannot thread one), so no mask is
applied here either.

Two execution paths:

* ``_attention_xla`` — plain einsum formulation; used on CPU (tests) and as
  the autodiff-friendly fallback.
* a fused Pallas flash-attention kernel (``fedcola_tpu.ops.flash_attention``)
  used on TPU for long sequences; dispatched by ``multi_head_attention``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float) -> jnp.ndarray:
    """q, k, v: [B, H, N, hd] -> [B, H, N, hd]."""
    q = q * scale
    # float32 logits + softmax (reference mome.py:157-162)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _use_pallas_here() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def multi_head_attention(x: jnp.ndarray,
                         qkv_kernel: jnp.ndarray, qkv_bias: jnp.ndarray,
                         proj_kernel: jnp.ndarray, proj_bias: jnp.ndarray,
                         num_heads: int,
                         use_pallas: bool = True) -> jnp.ndarray:
    """Fused qkv-projection -> attention -> out-projection.

    x: [B, N, D].  qkv_kernel: [D, 3D] (q;k;v concatenated on the out axis,
    matching the reference's single ``nn.Linear(dim, dim*3)``), proj_kernel:
    [D, D].
    """
    B, N, D = x.shape
    hd = D // num_heads
    scale = hd ** -0.5

    qkv = x @ qkv_kernel.astype(x.dtype) + qkv_bias.astype(x.dtype)
    qkv = qkv.reshape(B, N, 3, num_heads, hd)
    q, k, v = jnp.moveaxis(qkv, 2, 0)          # each [B, N, H, hd]
    q = jnp.swapaxes(q, 1, 2)                  # [B, H, N, hd]
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)

    if use_pallas and _use_pallas_here():
        from fedcola_tpu.ops.flash_attention import flash_attention
        out = flash_attention(q, k, v, scale)
    else:
        out = _attention_xla(q, k, v, scale)

    out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
    return out @ proj_kernel.astype(x.dtype) + proj_bias.astype(x.dtype)
