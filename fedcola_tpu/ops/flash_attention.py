"""Fused multi-head attention Pallas kernels for TPU.

The MAT's sequences are short (197 image tokens, 40 text tokens —
mome.py:621, 232-266), so the [N, N] score matrix for one (batch, head)
pair fits comfortably in VMEM.  The win over unfused XLA is keeping the
whole softmax(QK^T)V chain — including the reference's float32
logits/softmax (mome.py:157-162) — inside VMEM with zero HBM round-trips
for the N^2 intermediates, for both forward and backward.

Design:
* grid over (batch, heads); each program computes one head's full
  attention with fp32 scores on the MXU;
* custom VJP: the backward kernel recomputes the probability matrix from
  (q, k, v) — cheaper than spilling [B, H, N, N] probabilities to HBM
  (flash-attention-style rematerialisation, specialised to the
  single-block case);
* falls back to the XLA einsum path for long sequences (tiled flash
  attention is unnecessary at MAT's lengths; documented non-goal in
  SURVEY.md §5 long-context).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# above this sequence length we'd need a tiled online-softmax kernel;
# MAT never exceeds 197.
MAX_FUSED_SEQ = 1024


def _interpret() -> bool:
    """Interpreter mode off-TPU (CPU tests exercise the same kernel code)."""
    return jax.default_backend() != "tpu"


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref):
    """One program handles G (batch*head) pairs: [G, N, hd] blocks.  The
    per-pair loop is unrolled at trace time, amortising grid iteration
    overhead while each matmul stays MXU-shaped."""
    G = q_ref.shape[0]
    for g in range(G):
        q = q_ref[g].astype(jnp.float32)      # [N, hd]
        k = k_ref[g].astype(jnp.float32)
        v = v_ref[g]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / denom).astype(v.dtype)
        o_ref[g] = jnp.dot(p, v,
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    G = q_ref.shape[0]
    for g in range(G):
        q = q_ref[g].astype(jnp.float32)
        k = k_ref[g].astype(jnp.float32)
        v = v_ref[g].astype(jnp.float32)
        do = do_ref[g].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)          # [N, N]
        dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[g] = dq.astype(dq_ref.dtype)
        dk_ref[g] = dk.astype(dk_ref.dtype)
        dv_ref[g] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """q, k, v: [B, H, N, hd] -> [B, H, N, hd].  fp32 scores, softmax in
    fp32, output in q's dtype (reference Attention.forward numerics)."""
    return _fa_fwd(q, k, v, scale)[0]


def _merge_bh(x):
    B, H, N, hd = x.shape
    return x.reshape(B * H, N, hd)


def _pick_group(n_pairs: int, N: int, hd: int, n_bufs: int) -> int:
    """Largest divisor of n_pairs whose working set fits a VMEM budget.
    Returns 0 when even a single (batch, head) pair exceeds the budget —
    callers must route that shape to the XLA fallback instead of
    launching a kernel Mosaic cannot allocate."""
    per_pair = n_bufs * N * hd * 4 + 3 * N * N * 4
    budget = 10 * 1024 * 1024
    g_max = budget // per_pair
    if g_max < 1:
        return 0
    g = 1
    for cand in range(1, min(g_max, n_pairs) + 1):
        if n_pairs % cand == 0:
            g = cand
    return g


def _fa_fwd(q, k, v, scale: float):
    B, H, N, hd = q.shape
    if N > MAX_FUSED_SEQ:
        from fedcola_tpu.ops.attention import _attention_xla
        return _attention_xla(q, k, v, scale), (q, k, v)
    G = _pick_group(B * H, N, hd, n_bufs=4)
    if G == 0:   # one pair alone blows the VMEM budget
        from fedcola_tpu.ops.attention import _attention_xla
        return _attention_xla(q, k, v, scale), (q, k, v)
    qm = _merge_bh(q * jnp.asarray(scale, q.dtype))
    km, vm = _merge_bh(k), _merge_bh(v)
    spec = pl.BlockSpec((G, N, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        _fwd_kernel,
        grid=(B * H // G,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * H, N, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * hd,
            bytes_accessed=4 * B * H * N * hd * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
        interpret=_interpret(),
    )(qm, km, vm)
    return o.reshape(B, H, N, hd), (q, k, v)


def _fa_bwd(scale: float, residuals, do):
    q, k, v = residuals
    B, H, N, hd = q.shape
    if N > MAX_FUSED_SEQ:
        # fall back to differentiating the XLA path
        from fedcola_tpu.ops.attention import _attention_xla
        _, vjp = jax.vjp(lambda q_, k_, v_: _attention_xla(q_, k_, v_, scale),
                         q, k, v)
        return vjp(do)
    G = _pick_group(B * H, N, hd, n_bufs=7)
    if G == 0:   # one pair alone blows the VMEM budget
        from fedcola_tpu.ops.attention import _attention_xla
        _, vjp = jax.vjp(lambda q_, k_, v_: _attention_xla(q_, k_, v_, scale),
                         q, k, v)
        return vjp(do)
    qm = _merge_bh(q * jnp.asarray(scale, q.dtype))
    km, vm, dom = _merge_bh(k), _merge_bh(v), _merge_bh(do)
    spec = pl.BlockSpec((G, N, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=(B * H // G,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct((B * H, N, hd), q.dtype),
                   jax.ShapeDtypeStruct((B * H, N, hd), k.dtype),
                   jax.ShapeDtypeStruct((B * H, N, hd), v.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * N * N * hd,
            bytes_accessed=8 * B * H * N * hd * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
        interpret=_interpret(),
    )(qm, km, vm, dom)
    unm = lambda x: x.reshape(B, H, N, hd)
    # dq carries the pre-applied scale (q was scaled before the kernel)
    return (unm(dq) * jnp.asarray(scale, q.dtype), unm(dk), unm(dv))


flash_attention.defvjp(_fa_fwd, _fa_bwd)
