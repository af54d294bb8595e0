"""Loss functions.

Parity targets:

* ``cross_entropy`` — ``torch.nn.CrossEntropyLoss`` (mean over batch), used
  for all uni-modal classification clients (reference fedavgclient.py:84-91).
* ``clip_contrastive`` — the semantics of ``torchmultimodal``'s
  ``ContrastiveLossWithTemperature`` as the reference *actually uses it*:
  the criterion object is constructed **per batch**
  (``self.criterion()(*outputs)``, fedavgclient.py:95), so the learnable
  ``logit_scale`` is re-initialised every step to the CLIP default
  ``ln(1/0.07)`` and never survives an optimizer step.  Net behavior: a fixed
  temperature of 1/0.07 with symmetric cross-entropy over the in-batch
  similarity matrix.
* ``painless_bce`` — ``PainlessBCEWithLogitsLoss`` (src/utils.py:286-300):
  shape/dtype tolerant binary cross entropy with logits.
* ``seq2seq_ce`` — ``Seq2SeqLoss`` (src/utils.py:303-315): CE over flattened
  (B*L, V) logits ignoring index -1.
* ``fedprox_term`` — the FedProx proximal penalty
  mu/2 * sum ||w - w_global||^2 (fedproxclient.py:64-67).

All losses accept an optional boolean ``valid`` mask over the batch so that
a padded (partial) final batch reproduces the reference DataLoader's
``drop_last=False`` semantics: the mean is taken over valid rows only.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

CLIP_LOGIT_SCALE = math.log(1.0 / 0.07)


def _masked_mean(x: jnp.ndarray, valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    if valid is None:
        return jnp.mean(x)
    valid = valid.astype(x.dtype)
    return jnp.sum(x * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean CE over the batch; targets are integer class ids."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    return _masked_mean(nll, valid)


def painless_bce(logits: jnp.ndarray, targets: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """BCE-with-logits tolerant of shape/dtype mismatches
    (reference src/utils.py:286-300)."""
    logits = logits.astype(jnp.float32).reshape(logits.shape[0], -1)
    targets = targets.astype(jnp.float32).reshape(targets.shape[0], -1)
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    per = jnp.mean(per, axis=-1)
    return _masked_mean(per, valid)


def seq2seq_ce(logits: jnp.ndarray, targets: jnp.ndarray,
               ignore_index: int = -1) -> jnp.ndarray:
    """CE over [B, L, V] logits vs [B, L] targets, ignoring `ignore_index`
    (reference src/utils.py:303-315)."""
    B, L, V = logits.shape
    flat_logits = logits.reshape(B * L, V).astype(jnp.float32)
    flat_t = targets.reshape(B * L)
    keep = (flat_t != ignore_index)
    logp = jax.nn.log_softmax(flat_logits, axis=-1)
    safe_t = jnp.where(keep, flat_t, 0).astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, safe_t[:, None], axis=-1)[:, 0]
    return _masked_mean(nll, keep)


def clip_contrastive(img_emb: jnp.ndarray, txt_emb: jnp.ndarray,
                     valid: Optional[jnp.ndarray] = None,
                     logit_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Symmetric CLIP contrastive loss over L2-normalised embeddings.

    Matches torchmultimodal ``ContrastiveLossWithTemperature`` with its
    default init and the reference's per-batch re-instantiation: temperature
    fixed at exp(ln(1/0.07)) = 1/0.07.  ``valid`` masks padded rows: their
    logits are excluded from both softmax directions and from the mean.
    """
    scale = jnp.exp(logit_scale) if logit_scale is not None \
        else jnp.float32(math.exp(CLIP_LOGIT_SCALE))
    img = img_emb.astype(jnp.float32)
    txt = txt_emb.astype(jnp.float32)
    logits = scale * (img @ txt.T)                 # [B, B]
    if valid is not None:
        neg = jnp.float32(-1e9)
        col_mask = valid[None, :]
        row_mask = valid[:, None]
        logits = jnp.where(col_mask, logits, neg)
        logits = jnp.where(row_mask, logits, neg)
    labels = jnp.arange(logits.shape[0])
    li = -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                              labels[:, None], axis=-1)[:, 0]
    lt = -jnp.take_along_axis(jax.nn.log_softmax(logits.T, axis=-1),
                              labels[:, None], axis=-1)[:, 0]
    per = 0.5 * (li + lt)
    return _masked_mean(per, valid)


def fedprox_term(params, global_params, mu: float) -> jnp.ndarray:
    """mu/2 * ||w - w_g||^2 summed over all leaves
    (reference fedproxclient.py:64-67)."""
    leaves = jax.tree_util.tree_leaves(params)
    gleaves = jax.tree_util.tree_leaves(global_params)
    acc = jnp.float32(0.0)
    for w, g in zip(leaves, gleaves):
        d = w.astype(jnp.float32) - g.astype(jnp.float32)
        acc = acc + jnp.sum(d * d)
    return 0.5 * mu * acc
