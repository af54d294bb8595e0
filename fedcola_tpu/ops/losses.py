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
               valid: Optional[jnp.ndarray] = None,
               ignore_indices=(0, 1, 2, 3)) -> jnp.ndarray:
    """CE over [B, L, V] logits vs [B, L] targets, ignoring special tokens
    (reference ``Seq2SeqLoss``, src/utils.py:303-315: targets in
    ``ignore_indices`` — default [0, 1, 2, 3], the special-token ids — are
    remapped to -1 and excluded via ``ignore_index=-1``; a batch of ONLY
    special tokens yields 0.0, which ``_masked_mean``'s max(count, 1)
    denominator reproduces).  ``valid`` masks padded batch rows
    (drop_last=False parity): their tokens are excluded from the mean even
    though the padding duplicates real token ids."""
    B, L, V = logits.shape
    flat_logits = logits.reshape(B * L, V).astype(jnp.float32)
    flat_t = targets.reshape(B * L)
    keep = (flat_t != -1)
    for ig in ignore_indices:
        keep = keep & (flat_t != ig)
    if valid is not None:
        keep = keep & jnp.repeat(valid, L)
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


def dice_loss(probs: jnp.ndarray, onehot: jnp.ndarray,
              valid: Optional[jnp.ndarray] = None,
              eps: float = 1e-7) -> jnp.ndarray:
    """Dice loss over [B, ...] probability maps
    (reference segmentation_loss.py:9-32)."""
    B = probs.shape[0]
    p = probs.reshape(B, -1)
    t = onehot.reshape(B, -1)
    inter = jnp.sum(p * t, axis=1)
    union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1)
    return _masked_mean(1.0 - 2.0 * inter / (union + eps), valid)


def seg_loss(logits: jnp.ndarray, targets: jnp.ndarray,
             valid: Optional[jnp.ndarray] = None,
             weight_ce: float = 0.5, weight_dice: float = 0.5) -> jnp.ndarray:
    """CE + Dice combination (reference ``SegLoss``,
    segmentation_loss.py:35-50).  logits: [B, C, ...], targets: [B, ...]
    integer labels (the reference indexes target[:, 0]).  ``valid`` masks
    padded batch rows in both terms.

    Deliberate divergence: the reference's Dice term flattens the
    softmax as [B, C*H*W] but ``F.one_hot(target)`` (un-indexed, so
    [B, 1, H, W, C]) as [B, H*W*C] — the elementwise product pairs
    unrelated (class, pixel) entries, so upstream Dice is scrambled
    (segmentation_loss.py:24-28,48).  We align the one-hot to the class
    axis (the intended math); documented in PARITY.md E3."""
    B, C = logits.shape[0], logits.shape[1]
    flat_logits = jnp.moveaxis(logits, 1, -1).reshape(-1, C)
    t = targets[:, 0] if targets.ndim == logits.ndim else targets
    flat_t = t.reshape(-1).astype(jnp.int32)
    ce_valid = None
    if valid is not None:
        per_row = flat_t.shape[0] // B
        ce_valid = jnp.repeat(valid, per_row)
    ce = cross_entropy(flat_logits, flat_t, ce_valid)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    onehot = jax.nn.one_hot(t, C, axis=1, dtype=jnp.float32)
    return weight_ce * ce + weight_dice * dice_loss(probs, onehot, valid)


def mc_soft_contrastive(img_emb: jnp.ndarray, txt_emb: jnp.ndarray,
                        valid: Optional[jnp.ndarray] = None,
                        shift: float = 15.0,
                        negative_scale: float = 15.0) -> jnp.ndarray:
    """PCME Monte-Carlo soft contrastive loss, K=1 embedding case
    (reference ``MCSoftContrastiveLoss``, src/criterions/probemb.py:89-259;
    the alternative multimodal criterion, commented alt at
    fedavgserver.py:79).

    With one sample per embedding the per-pair NLL reduces to
    ``softplus(-2 * s * m)`` where ``s = -negative_scale * ||zi - zj|| +
    shift`` and ``m`` is +1 on the diagonal, -1 off it; the loss sums both
    retrieval directions (reduction='sum', the reference default).  The
    learnable shift/negative_scale stay at their init — like the CLIP
    temperature, the criterion is re-instantiated per batch in the
    reference client loop.
    """
    a = img_emb.astype(jnp.float32)
    b = txt_emb.astype(jnp.float32)
    d2 = jnp.sum(jnp.square(a[:, None, :] - b[None, :, :]), axis=-1)
    dist = jnp.sqrt(d2 + 1e-6)
    s = -negative_scale * dist + shift
    n = a.shape[0]
    m = jnp.where(jnp.eye(n, dtype=bool), 1.0, -1.0)
    nll = jax.nn.softplus(-2.0 * s * m)
    if valid is not None:
        pair_ok = (valid[:, None] & valid[None, :]).astype(jnp.float32)
        nll = nll * pair_ok
    return 2.0 * jnp.sum(nll)  # i2t + t2i directions


def _norm_sum(w, g, per_layer: bool) -> jnp.ndarray:
    """Sum of L2 norms of (w - g); with ``per_layer`` the leading axis is
    the layer stack and each layer slice is one norm.  torch's norm
    backward returns 0 at zero distance (the first local step, where
    w == w_g); the where-guard reproduces that subgradient choice
    instead of NaN."""
    d = w.astype(jnp.float32) - g.astype(jnp.float32)
    if per_layer:
        sq = jnp.sum(jnp.reshape(d, (d.shape[0], -1)) ** 2, axis=1)
    else:
        sq = jnp.sum(d * d)
    norm = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.sum(jnp.where(sq > 0, norm, 0.0))


def fedprox_term(params, global_params, mu: float) -> jnp.ndarray:
    """mu * 0.5 * sum of per-NAMED-PARAMETER L2 *norms* (NOT squared
    norms): ``prox += (param - global).norm(2)`` per named parameter,
    then ``loss += mu * (0.5 * prox)`` (reference fedproxclient.py:64-67
    — the fork diverges from the FedProx paper's squared norm here;
    parity follows the code).

    A torch named parameter = one layer's tensor, so the depth-stacked
    ``blk``/``aux`` leaves contribute one norm PER LAYER SLICE, not one
    norm of the whole stack (sum of per-layer norms != norm of the
    stack).  The same leaves arrive as per-layer tuples under
    ``perlayer_io`` — both representations produce identical numerics.
    Tied colearn attn leaves are dropped from the non-main slot at init,
    matching torch named_parameters' shared-Parameter dedup."""
    def walk(p, g, per_layer):
        if isinstance(p, dict):
            return sum(walk(p[k], g[k], per_layer or k in ("blk", "aux"))
                       for k in sorted(p))
        if isinstance(p, tuple):          # perlayer_io layer tuples
            return sum(_norm_sum(pl, gl, False) for pl, gl in zip(p, g))
        return _norm_sum(p, g, per_layer)
    return mu * 0.5 * walk(params, global_params, False)
