"""ModalityAgnosticTransformer (MAT) as pure functions over pytrees.

Re-architecture of the reference's ``ModalityAgnosticTransformer``
(reference ``src/models/mome.py:671-922``) for TPU/XLA:

* Every per-modality 12-deep transformer stack is stored as **stacked-layer
  leaves** (leading ``depth`` axis) and executed with ``jax.lax.scan`` — one
  compiled block body instead of 12 unrolled ones.
* Modality slots: a model is configured with a ``modalities`` tuple such as
  ``('img', None)`` / ``(None, 'txt')`` / ``('img', 'txt')``; absent slots
  simply have no parameters (the functional analog of the reference's
  ``None`` ``nn.ModuleList`` entries, mome.py:712-750).
* FedCola aux (cross-modal reparameterisation, mome.py:42-97): for uni-modal
  models built ``with_aux``, an ``aux`` collection holds per-layer
  ``aux_weight`` stacks and ``cross_modal_scale`` scalars; the effective
  matmul operand is ``W + scale * W_aux`` folded directly into the kernel.

Numerics parity with the reference:
* attention logits + softmax in float32 (mome.py:157-162);
* block LayerNorm eps=1e-5 (torch default), final norm eps=1e-6
  (mome.py:751), Bert text-embedding LayerNorm eps=1e-12;
* stochastic depth (DropPath) with per-layer rate ``linspace(0, p, depth)``
  (mome.py:726-728) is the only active stochastic regulariser in the
  reference configuration;
* no attention mask — the reference's ``nn.Sequential`` stacks cannot thread
  one (mome.py:902-907), so padded text tokens attend fully;
* parameter init mirrors torch defaults (kaiming-uniform a=sqrt(5) for
  linear/conv, N(0,1) for embedding tables, zeros for cls/pos tokens) since
  the reference never applies a custom init to MAT.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fedcola_tpu.ops.attention import multi_head_attention

Params = Dict[str, Any]


@dataclass(frozen=True)
class MATConfig:
    """Static model configuration (hashable: safe as a jit static arg)."""
    modalities: Tuple[Optional[str], ...] = ("img", "txt")
    tasks: Tuple[Optional[str], ...] = ("cls", None)
    num_classes: Tuple[Optional[int], ...] = (None, None)
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    vocab_size: int = 30522
    max_text_len: int = 40
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    shared_param: str = "none"
    share_scope: str = "dataset"
    colearn_param: str = "none"
    with_aux: bool = False
    aux_trained: bool = False
    aux_attn_only: bool = False
    aux_mlp_only: bool = False
    use_pallas: bool = True
    # below this sequence length the fused attention kernel is pure
    # pipeline-drain overhead (dozens of tiny [N, hd] dots per program);
    # short stacks (40-token text) run the unfused XLA path instead
    fused_attn_min_seq: int = 0
    # lax.scan unroll factor for the layer stack (1 = rolled loop)
    scan_unroll: int = 1
    # per-layer parameter I/O inside the training chunk: stacked
    # [depth, ...] blk/aux leaves are sliced into per-layer tuples at chunk
    # entry and restacked at exit (client_update.build_group_update), so
    # the unrolled layer loop reads whole leaves instead of slicing the
    # stacked array every step — targeting the profiled 56 MB stacked-
    # kernel relayout copies XLA inserts between the optimizer's preferred
    # tiling and the slice consumers (BENCH_NOTES round 3, XLA-tail item 3)
    perlayer_io: bool = False
    # fused MLP pallas kernel (ops/fused_mlp.py): safe under client-vmapped
    # training too — its custom_vmap rule makes the client axis an outer
    # grid dimension, so weights don't replicate inside VMEM
    use_fused_mlp: bool = False
    compute_dtype: str = "bfloat16"
    remat: bool = True  # rematerialise block activations in the backward pass
    # 'full': store only per-layer inputs (min HBM, recompute everything);
    # 'save_attn': additionally store attention outputs, skipping the
    # attention recompute in the backward pass (swept: 1856 vs full 1735
    # vs no-remat 1836 samples/s on v5e);
    # 'kernel' (default): no jax-level checkpoint — the fused attention
    # kernel saves its softmax probs + head concat through its VJP so the
    # backward skips every score/softmax/AV recompute, and the fused MLP
    # recomputes from row inputs in-kernel; falls back to 'save_attn'
    # where the fused paths are unavailable (CPU, unaligned dims, or a
    # stack below fused_attn_min_seq).  HBM cost of 'kernel': the saved
    # probs are per-layer [B, H, N, N] bf16 (~depth*B*H*N^2*2 bytes —
    # 223 MB at B=96/H=6/N=197/depth=12, vs 'save_attn' storing [B, N, D]
    # attention outputs only); bigger client stacks that OOM under
    # 'kernel' should set remat_policy='save_attn' or 'full'
    remat_policy: str = "kernel"

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def hidden_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    # Widths above 512 need Mosaic's per-kernel scoped-VMEM limit raised
    # (the backward kernels' f32 dW accumulators — [D, 4D] + [4D, D]
    # ≈ 19 MB at D=768 — exceed the ~16 MB default check, though v5e
    # physically has 128 MB VMEM/core): ops/common.wide_compiler_params
    # passes vmem_limit_bytes=96MB for D>512, measured 131.8 TF/s
    # incl-recompute on the D=768 MLP backward (scripts/
    # vmem_limit_probe3.py).  D=1024 (the cap) compile+run verified on
    # the real chip for both kernel families (fwd+bwd); D>1024 widths
    # would push the dW accumulators toward physical VMEM and are
    # unregistered, so they take the XLA path.
    FUSED_MAX_EMBED_DIM = 1024

    @property
    def fused_mlp_ok(self) -> bool:
        """The fused MLP's dW DMA spill requires 128-lane-aligned dims
        (Mosaic memref slices): ViT-small qualifies, tiny/toy don't, and
        base-class widths exceed the VMEM blocking (see
        FUSED_MAX_EMBED_DIM)."""
        return (self.use_fused_mlp and self.embed_dim % 128 == 0
                and self.hidden_dim % 128 == 0
                and self.embed_dim <= self.FUSED_MAX_EMBED_DIM)

    @property
    def fused_attn_ok(self) -> bool:
        """Fully fused attention sublayer (LN1+qkv+attention+proj) — same
        alignment and width constraints as the fused MLP."""
        return (self.use_pallas and self.embed_dim % 128 == 0
                and self.embed_dim <= self.FUSED_MAX_EMBED_DIM)

    @property
    def main_slot(self) -> int:
        """First present modality slot (reference mome.py:768-771,819-822)."""
        for i, m in enumerate(self.modalities):
            if m is not None:
                return i
        raise ValueError("model has no present modality")

    @property
    def is_multimodal(self) -> bool:
        return sum(m is not None for m in self.modalities) > 1

    @property
    def has_aux(self) -> bool:
        """Aux collection exists only for uni-modal ``with_aux`` models
        (mome.py:767-768: ``if self.with_aux and None in self.modalities``)."""
        return self.with_aux and (None in self.modalities)

    @property
    def aux_layer_kinds(self) -> Tuple[str, ...]:
        """Which linear layers are reparameterised (mome.py:772-784)."""
        if self.aux_attn_only:
            return ("qkv", "proj")
        if self.aux_mlp_only:
            return ("fc1", "fc2")
        return ("qkv", "proj", "fc1", "fc2")

    @property
    def drop_path_rates(self) -> Tuple[float, ...]:
        if self.depth == 1:
            return (0.0,)
        return tuple(float(x) for x in
                     np.linspace(0.0, self.drop_path_rate, self.depth))

    def replace(self, **kw) -> "MATConfig":
        return dataclasses.replace(self, **kw)


# ------------------------------------------------------------------ init ---

def _uniform(rng, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def _linear_init(rng, fan_in: int, shape_kernel, shape_bias):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
    for both kernel and bias."""
    k_rng, b_rng = jax.random.split(rng)
    bound = 1.0 / math.sqrt(fan_in)
    return (_uniform(k_rng, shape_kernel, bound),
            _uniform(b_rng, shape_bias, bound))


def _init_image_embedding(cfg: MATConfig, rng) -> Params:
    """PatchEmbed conv + cls token + learned pos embed
    (reference mome.py:578-611)."""
    P, C, D = cfg.patch_size, cfg.in_chans, cfg.embed_dim
    fan_in = C * P * P
    k, b = _linear_init(rng, fan_in, (P, P, C, D), (D,))
    return {
        "patch_kernel": k,                      # [P, P, C, D]
        "patch_bias": b,                        # [D]
        "cls": jnp.zeros((1, 1, D)),            # mome.py:595 (zeros)
        "pos": jnp.zeros((1, cfg.num_patches + 1, D)),  # mome.py:592 (zeros)
    }


def _init_text_embedding(cfg: MATConfig, rng) -> Params:
    """BertEmbeddings-equivalent (reference mome.py:613-639).  Standalone
    ``BertEmbeddings`` keeps torch's default N(0,1) embedding init."""
    r1, r2, r3 = jax.random.split(rng, 3)
    D = cfg.embed_dim
    return {
        "word": jax.random.normal(r1, (cfg.vocab_size, D)),
        "posemb": jax.random.normal(r2, (cfg.max_text_len, D)),
        "toktype": jax.random.normal(r3, (2, D)),
        "ln_scale": jnp.ones((D,)),
        "ln_bias": jnp.zeros((D,)),
    }


def _init_block_stack(cfg: MATConfig, rng) -> Params:
    """One modality's ``depth``-deep stack, leaves stacked on axis 0
    (reference Block, mome.py:186-228)."""
    D, H, depth = cfg.embed_dim, cfg.hidden_dim, cfg.depth
    rngs = jax.random.split(rng, 4 * depth).reshape(depth, 4, 2)
    qkv_k, qkv_b = [], []
    proj_k, proj_b = [], []
    fc1_k, fc1_b = [], []
    fc2_k, fc2_b = [], []
    for i in range(depth):
        k, b = _linear_init(rngs[i, 0], D, (D, 3 * D), (3 * D,))
        qkv_k.append(k); qkv_b.append(b)
        k, b = _linear_init(rngs[i, 1], D, (D, D), (D,))
        proj_k.append(k); proj_b.append(b)
        k, b = _linear_init(rngs[i, 2], D, (D, H), (H,))
        fc1_k.append(k); fc1_b.append(b)
        k, b = _linear_init(rngs[i, 3], H, (H, D), (D,))
        fc2_k.append(k); fc2_b.append(b)
    return {
        "norm1_scale": jnp.ones((depth, D)), "norm1_bias": jnp.zeros((depth, D)),
        "qkv_kernel": jnp.stack(qkv_k), "qkv_bias": jnp.stack(qkv_b),
        "proj_kernel": jnp.stack(proj_k), "proj_bias": jnp.stack(proj_b),
        "norm2_scale": jnp.ones((depth, D)), "norm2_bias": jnp.zeros((depth, D)),
        "fc1_kernel": jnp.stack(fc1_k), "fc1_bias": jnp.stack(fc1_b),
        "fc2_kernel": jnp.stack(fc2_k), "fc2_bias": jnp.stack(fc2_b),
    }


def init_mat(cfg: MATConfig, rng) -> Params:
    """Build the full parameter pytree for one MAT."""
    params: Params = {"emb": {}, "blk": {}, "head": {}}
    n_slots = len(cfg.modalities)
    rngs = jax.random.split(rng, 3 * n_slots)   # emb, blk, head per slot

    for i, modality in enumerate(cfg.modalities):
        if modality == "img":
            params["emb"][str(i)] = _init_image_embedding(cfg, rngs[2 * i])
        elif modality == "txt":
            params["emb"][str(i)] = _init_text_embedding(cfg, rngs[2 * i])
        elif modality is not None:
            raise NotImplementedError(modality)
        if modality is not None:
            params["blk"][str(i)] = _init_block_stack(cfg, rngs[2 * i + 1])

    # colearn_param='attn' ties every layer's attn between the two stacks of
    # a multimodal model (mome.py:837-841).  Functionally: the non-main
    # slot's attn leaves are dropped; apply() reads them from the main slot.
    if cfg.colearn_param == "attn" and cfg.is_multimodal:
        main = str(cfg.main_slot)
        for i, m in enumerate(cfg.modalities):
            if m is not None and str(i) != main:
                for leaf in ("qkv_kernel", "qkv_bias", "proj_kernel", "proj_bias"):
                    del params["blk"][str(i)][leaf]
    # colearn_param='blocks' is a no-op local rebinding in the reference
    # (mome.py:833-836) — parity: nothing tied.

    # shared final norm (mome.py:751-752)
    params["norm"] = {"scale": jnp.ones((cfg.embed_dim,)),
                      "bias": jnp.zeros((cfg.embed_dim,))}

    # heads (mome.py:754-765): cls -> Linear, rtv -> identity (no params);
    # per-slot rng so two cls heads never start bit-identical
    for i, task in enumerate(cfg.tasks):
        if task == "cls":
            nc = cfg.num_classes[i]
            k, b = _linear_init(rngs[2 * n_slots + i], cfg.embed_dim,
                                (cfg.embed_dim, nc), (nc,))
            params["head"][str(i)] = {"kernel": k, "bias": b}

    # aux collection (mome.py:767-786): aux_weight starts as a copy of the
    # model's own main-stack weights, cross_modal_scale starts at zero.
    if cfg.has_aux:
        main_blk = params["blk"][str(cfg.main_slot)]
        aux: Params = {}
        for kind in cfg.aux_layer_kinds:
            aux[f"{kind}_aux"] = jnp.array(main_blk[f"{kind}_kernel"])
            aux[f"{kind}_scale"] = jnp.zeros((cfg.depth,))
        params["aux"] = aux

    return params


# --------------------------------------------------------------- forward ---

def _layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _drop_path(x, rate, rng, train: bool):
    """Per-sample stochastic depth (timm DropPath semantics).  ``rate`` is
    traced (a scanned per-layer value), so callers gate on the *static*
    ``cfg.drop_path_rate == 0`` to skip the mask entirely."""
    if not train:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    inv = (1.0 / keep).astype(x.dtype)
    return jnp.where(mask, x * inv, jnp.zeros_like(x))


def fold_aux_kernels(cfg: MATConfig, blk: Params, aux: Params) -> Params:
    """``W_eff = W + scale * W_aux`` over ``cfg.aux_layer_kinds``
    (mome.py:58-60) — the ONE implementation of the reparam fold, shared
    by the forward pass (:func:`_effective_kernels`) and the upload
    fold-in (``federation/aux.py``).  The ``[..., depth] -> [..., depth,
    1, 1]`` scale broadcast handles single and stacked ([n, ...]) trees;
    per-layer tuples (``perlayer_io``) fold layer by layer."""
    blk = dict(blk)
    for kind in cfg.aux_layer_kinds:
        key = f"{kind}_kernel"
        if isinstance(blk[key], tuple):
            blk[key] = tuple(w + s * a for w, s, a in
                             zip(blk[key], aux[f"{kind}_scale"],
                                 aux[f"{kind}_aux"]))
            continue
        scale = aux[f"{kind}_scale"][..., :, None, None]
        blk[key] = blk[key] + scale * aux[f"{kind}_aux"]
    return blk


def unstack_layer_leaves(cfg: MATConfig, tree: Params) -> Params:
    """[depth, ...]-stacked blk/aux leaves -> per-layer tuples (the
    ``perlayer_io`` chunk-internal representation).  emb/head/norm leaves
    pass through untouched.  Works on per-client (unstacked-client) trees —
    i.e. inside the vmapped chunk program."""
    out = dict(tree)
    if "blk" in tree:
        out["blk"] = {s: {k: tuple(v[l] for l in range(cfg.depth))
                          for k, v in slot.items()}
                      for s, slot in tree["blk"].items()}
    if "aux" in tree:
        out["aux"] = {k: tuple(v[l] for l in range(cfg.depth))
                      for k, v in tree["aux"].items()}
    return out


def restack_layer_leaves(cfg: MATConfig, tree: Params) -> Params:
    """Inverse of :func:`unstack_layer_leaves`."""
    out = dict(tree)
    if "blk" in tree:
        out["blk"] = {s: {k: (jnp.stack(v) if isinstance(v, tuple) else v)
                          for k, v in slot.items()}
                      for s, slot in tree["blk"].items()}
    if "aux" in tree:
        out["aux"] = {k: (jnp.stack(v) if isinstance(v, tuple) else v)
                      for k, v in tree["aux"].items()}
    return out


def unstack_counter_leaves(cfg: MATConfig, tree: Params) -> Params:
    """Mirror of :func:`unstack_layer_leaves` for the optimizer's per-leaf
    step-counter tree: blk/aux counters are scalars (no layer axis), so
    replicate them across the layer tuples to keep the counter tree
    structurally aligned with the unstacked params."""
    out = dict(tree)
    if "blk" in tree:
        out["blk"] = {s: {k: tuple(v for _ in range(cfg.depth))
                          for k, v in slot.items()}
                      for s, slot in tree["blk"].items()}
    if "aux" in tree:
        out["aux"] = {k: tuple(v for _ in range(cfg.depth))
                      for k, v in tree["aux"].items()}
    return out


def restack_counter_leaves(cfg: MATConfig, tree: Params) -> Params:
    """Inverse of :func:`unstack_counter_leaves`: frozen masks are
    per-leaf-path, so every layer of a tuple stepped identically — take
    the first layer's counter."""
    out = dict(tree)
    if "blk" in tree:
        out["blk"] = {s: {k: (v[0] if isinstance(v, tuple) else v)
                          for k, v in slot.items()}
                      for s, slot in tree["blk"].items()}
    if "aux" in tree:
        out["aux"] = {k: (v[0] if isinstance(v, tuple) else v)
                      for k, v in tree["aux"].items()}
    return out


def _effective_kernels(cfg: MATConfig, params: Params, slot: str) -> Params:
    """Fold aux reparam ``W_eff = W + scale * W_aux`` (mome.py:58-60) into the
    stacked kernels of the main slot.  Returns the block stack to run."""
    blk = dict(params["blk"][slot])
    if cfg.has_aux and int(slot) == cfg.main_slot and "aux" in params:
        blk = fold_aux_kernels(cfg, blk, params["aux"])
    # colearn attn tying: read attn leaves from the main slot
    if cfg.colearn_param == "attn" and cfg.is_multimodal \
            and int(slot) != cfg.main_slot:
        main = params["blk"][str(cfg.main_slot)]
        for leaf in ("qkv_kernel", "qkv_bias", "proj_kernel", "proj_bias"):
            blk[leaf] = main[leaf]
    return blk


def _run_stack(cfg: MATConfig, blk: Params, x: jnp.ndarray,
               train: bool, rng) -> jnp.ndarray:
    """Scan the stacked transformer layers over x: [B, N, D]."""
    dpr = jnp.asarray(cfg.drop_path_rates, dtype=jnp.float32)
    # DropPath at rate 0 is the identity: skip the per-sublayer bernoulli
    # mask + select entirely.  NOTE the canonical scripts train at rate
    # 0.1 — the reference factories pass drop_path_rate=args.dropout
    # (mome.py:944) whose default is 0.1 (main.py:223) — so the masks are
    # live in the flagship configuration and benchmarks must include them.
    use_dp = cfg.drop_path_rate > 0

    # per-stack decision: the min-seq gate can route a short-sequence
    # (text) stack to unfused attention even when the model config fuses —
    # that stack must then fall back to 'save_attn' so it still has a
    # residual policy (neither storing everything nor kernel residuals)
    fused_attn_here = (cfg.fused_attn_ok
                       and x.shape[1] >= cfg.fused_attn_min_seq
                       and jax.default_backend() == "tpu")
    fused_active = fused_attn_here and cfg.fused_mlp_ok
    policy = cfg.remat_policy
    if policy == "kernel" and not fused_active:
        policy = "save_attn"

    def layer_fwd(h, layer, rate, rng_a, rng_m):
        if train and policy == "kernel":
            # residual-folded fused path: the residual join AND the
            # per-sample DropPath scale run inside the kernels, removing
            # one [B, N, D] XLA read-modify-write pass per sublayer per
            # direction (the adds could not fuse into the opaque pallas
            # custom calls; folding them measured +6% step throughput on
            # v5e at the bench shape)
            from fedcola_tpu.ops.fused_attention import \
                make_fused_attention_residual_sublayer
            from fedcola_tpu.ops.fused_mlp import \
                fused_mlp_residual_sublayer_items
            B = h.shape[0]
            if use_dp:
                keep = 1.0 - rate
                s_a = jax.random.bernoulli(
                    rng_a, keep, (B,)).astype(jnp.float32) / keep
                s_m = jax.random.bernoulli(
                    rng_m, keep, (B,)).astype(jnp.float32) / keep
            else:
                s_a = s_m = jnp.ones((B,), jnp.float32)
            dtype = h.dtype
            h = make_fused_attention_residual_sublayer(cfg.num_heads)(
                h, s_a,
                layer["norm1_scale"], layer["norm1_bias"],
                layer["qkv_kernel"].astype(dtype),
                layer["qkv_bias"].astype(dtype),
                layer["proj_kernel"].astype(dtype),
                layer["proj_bias"].astype(dtype))
            h = fused_mlp_residual_sublayer_items(
                h, s_m,
                layer["norm2_scale"], layer["norm2_bias"],
                layer["fc1_kernel"].astype(dtype),
                layer["fc1_bias"].astype(dtype),
                layer["fc2_kernel"].astype(dtype),
                layer["fc2_bias"].astype(dtype))
            return h
        if fused_attn_here:
            from fedcola_tpu.ops.fused_attention import \
                make_fused_attention_sublayer
            dtype = h.dtype
            # LN params stay f32 (matches the unfused path's numerics);
            # matmul operands cast to the compute dtype
            # residual-saving is handled by the residual-folded branch
            # above (train + policy=='kernel' returned early); this path
            # is eval or a non-kernel remat policy, so never save
            a = make_fused_attention_sublayer(
                cfg.num_heads,
                save_residuals=False)(
                h,
                layer["norm1_scale"], layer["norm1_bias"],
                layer["qkv_kernel"].astype(dtype),
                layer["qkv_bias"].astype(dtype),
                layer["proj_kernel"].astype(dtype),
                layer["proj_bias"].astype(dtype))
        else:
            a = _layer_norm(h, layer["norm1_scale"], layer["norm1_bias"],
                            1e-5)
            a = multi_head_attention(
                a, layer["qkv_kernel"], layer["qkv_bias"],
                layer["proj_kernel"], layer["proj_bias"],
                cfg.num_heads,
                use_pallas=(cfg.use_pallas
                            and h.shape[1] >= cfg.fused_attn_min_seq))
        if policy == "save_attn":
            from jax.ad_checkpoint import checkpoint_name
            a = checkpoint_name(a, "attn_out")
        h = h + (_drop_path(a, rate, rng_a, train) if use_dp else a)
        if cfg.fused_mlp_ok and jax.default_backend() == "tpu":
            # LN2 is folded into the kernel (like LN1 in the attention
            # sublayer) and the grid runs over batch items: no
            # [B, N, D] -> rows flatten, whose sublane relayout at N=197
            # cost ~3.4 ms/step at the bench shape
            from fedcola_tpu.ops.fused_mlp import fused_mlp_sublayer_items
            m = fused_mlp_sublayer_items(
                h,
                layer["norm2_scale"], layer["norm2_bias"],
                layer["fc1_kernel"].astype(h.dtype),
                layer["fc1_bias"].astype(h.dtype),
                layer["fc2_kernel"].astype(h.dtype),
                layer["fc2_bias"].astype(h.dtype))
        else:
            m = _layer_norm(h, layer["norm2_scale"], layer["norm2_bias"],
                            1e-5)
            m = m @ layer["fc1_kernel"].astype(m.dtype) \
                + layer["fc1_bias"].astype(m.dtype)
            m = jax.nn.gelu(m, approximate=False)  # torch default: exact erf
            m = m @ layer["fc2_kernel"].astype(m.dtype) \
                + layer["fc2_bias"].astype(m.dtype)
        h = h + (_drop_path(m, rate, rng_m, train) if use_dp else m)
        return h

    perlayer = isinstance(next(iter(blk.values())), tuple)
    if train:
        layer_rngs = jax.random.split(rng, (cfg.depth, 2))
        # remat: store only per-layer inputs; recompute attention/MLP
        # intermediates in the backward pass (HBM >> FLOPs trade on TPU)
        if not cfg.remat or policy == "kernel":
            # 'kernel': the fused kernels carry their own residual policy
            # (attention saves softmax probs + head concat via its VJP; the
            # MLP recomputes everything from its row inputs in-kernel), so
            # no jax-level checkpoint wrapper is wanted
            fwd = layer_fwd
        elif policy == "save_attn":
            fwd = jax.checkpoint(
                layer_fwd,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_out"))
        else:
            fwd = jax.checkpoint(layer_fwd)

        if perlayer:
            # per-layer tuple leaves (perlayer_io): a python loop over
            # whole-leaf layers — the unrolled-scan equivalent without the
            # per-step stacked-array slicing (and, in the backward pass,
            # without the per-layer dW update-slices into a stacked grad)
            h = x
            for l in range(cfg.depth):
                layer = {k: v[l] for k, v in blk.items()}
                h = fwd(h, layer, dpr[l], layer_rngs[l, 0],
                        layer_rngs[l, 1])
            return h

        def body(h, xs):
            layer, rate, ks = xs
            return fwd(h, layer, rate, ks[0], ks[1]), None

        out, _ = jax.lax.scan(body, x, (blk, dpr, layer_rngs),
                              unroll=cfg.scan_unroll)
    else:
        if perlayer:
            h = x
            for l in range(cfg.depth):
                layer = {k: v[l] for k, v in blk.items()}
                h = layer_fwd(h, layer, dpr[l], None, None)
            return h

        def body(h, xs):
            layer, rate = xs
            return layer_fwd(h, layer, rate, None, None), None

        out, _ = jax.lax.scan(body, x, (blk, dpr), unroll=cfg.scan_unroll)
    return out


def _embed_image(cfg: MATConfig, emb: Params, x: jnp.ndarray,
                 train: bool, rng) -> jnp.ndarray:
    """Patchify [B, H, W, C] -> [B, N+1, D].  The conv patchify is expressed
    as reshape+matmul, which XLA maps straight onto the MXU."""
    dtype = jnp.dtype(cfg.compute_dtype)
    B, H, W, C = x.shape
    P = cfg.patch_size
    # 1-channel -> 3-channel repeat (reference mome.py:893-894)
    if C == 1 and cfg.in_chans == 3:
        x = jnp.repeat(x, 3, axis=-1)
        C = 3
    x = x.astype(dtype)
    # same hard size contract as the reference PatchEmbed (mome.py:262-263)
    # but with the actionable cause: a --crop that differs from the model's
    # img_size reaches here uncorrected (crop semantics are "pad 4 + crop
    # back to img_size" translation augmentation in the canonical configs)
    if (H, W) != (cfg.img_size, cfg.img_size):
        raise ValueError(
            f"input image size ({H}x{W}) doesn't match model "
            f"({cfg.img_size}x{cfg.img_size}); if --crop is set it must "
            "equal the model's img_size (the reference asserts the same, "
            "mome.py:262-263)")
    gh, gw = H // P, W // P
    x = x.reshape(B, gh, P, gw, P, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, gh * gw, P * P * C)
    kernel = emb["patch_kernel"].reshape(P * P * C, cfg.embed_dim)
    x = x @ kernel.astype(dtype) + emb["patch_bias"].astype(dtype)
    cls = jnp.broadcast_to(emb["cls"].astype(dtype),
                           (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + emb["pos"].astype(dtype)
    if train and cfg.drop_rate > 0:
        x = jnp.where(jax.random.bernoulli(rng, 1 - cfg.drop_rate, x.shape),
                      x / (1 - cfg.drop_rate), 0)
    return x


def _embed_text(cfg: MATConfig, emb: Params, ids: jnp.ndarray,
                train: bool, rng) -> jnp.ndarray:
    """BertEmbeddings: word + absolute position + token-type(0), then
    LayerNorm(eps=1e-12) (reference mome.py:613-639)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    B, L = ids.shape
    x = emb["word"][ids]
    x = x + emb["posemb"][:L][None, :, :]
    x = x + emb["toktype"][0][None, None, :]
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], 1e-12)
    return x.astype(dtype)


def mat_apply(cfg: MATConfig, params: Params,
              inputs: Sequence[Optional[jnp.ndarray]],
              feat_out: bool = False, train: bool = False,
              rng=None, seq_feat_out: bool = False):
    """Forward pass (reference mome.py:881-922).

    ``inputs`` is slot-aligned: image slots take [B, H, W, C] (NHWC,
    normalised floats or uint8 pixels pre-scaled by the data plane), text
    slots take [B, L] int token ids, absent slots take None.  Returns a
    slot-aligned list: logits (cls head), normalised CLS features (rtv head
    or ``feat_out=True``), or None for absent slots.

    ``seq_feat_out=True`` returns the rtv head's *literal* reference
    output: the full sequence with every token L2-normalised
    ([B, N, D] f32; RetrievalHead at mome.py:651-659 normalises
    ``feats[i]`` — the whole ``norm`` output, not the CLS token).  The
    only live consumer of that 3D form upstream is the CreamFL server
    distillation, whose ``code_sim`` sums it over tokens
    (creamflserver.py:314-318); everywhere else the reference either
    passes ``feat_out=True`` or would crash on the 3D shape (see
    PARITY.md, CreamFL notes)."""
    if train and rng is None:
        raise ValueError("training forward needs an rng")
    n_slots = len(cfg.modalities)
    rngs = jax.random.split(rng, 2 * n_slots) if train else [None] * (2 * n_slots)

    outs = [None] * n_slots
    for i, modality in enumerate(cfg.modalities):
        if modality is None:
            continue
        if inputs[i] is None:
            continue
        s = str(i)
        if modality == "img":
            h = _embed_image(cfg, params["emb"][s], inputs[i], train, rngs[2 * i])
        else:
            h = _embed_text(cfg, params["emb"][s], inputs[i], train, rngs[2 * i])
        blk = _effective_kernels(cfg, params, s)
        h = _run_stack(cfg, blk, h, train, rngs[2 * i + 1])
        h = _layer_norm(h, params["norm"]["scale"], params["norm"]["bias"], 1e-6)

        if seq_feat_out:
            hf = h.astype(jnp.float32)
            norm = jnp.linalg.norm(hf, axis=-1, keepdims=True)
            outs[i] = hf / jnp.maximum(norm, 1e-12)
            continue
        cls_tok = h[:, 0].astype(jnp.float32)
        if feat_out or cfg.tasks[i] == "rtv":
            norm = jnp.linalg.norm(cls_tok, axis=-1, keepdims=True)
            outs[i] = cls_tok / jnp.maximum(norm, 1e-12)
        elif cfg.tasks[i] == "cls":
            head = params["head"][s]
            outs[i] = cls_tok @ head["kernel"].astype(jnp.float32) \
                + head["bias"].astype(jnp.float32)
        else:
            outs[i] = cls_tok
    return outs


def param_count(params: Params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
