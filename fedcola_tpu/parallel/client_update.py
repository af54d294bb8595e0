"""Batched client local updates: the north-star TPU re-architecture.

The reference trains sampled clients *sequentially in Python threads*
(``FedavgServer._request`` -> ``FedavgClient.update``,
fedavgserver.py:505-589, fedavgclient.py:55-118).  Here a round's sampled
clients are grouped by dataset (same model structure, same modality, same
loss), their parameters/optimizer states/data are stacked on a leading
``client`` axis, and local SGD runs as **one jitted program per group**:

    vmap(client) [ lax.scan(steps) [ forward + backward + optimizer ] ]

The client axis can be sharded over a ``jax.sharding.Mesh`` so a v5e-8 runs
eight clients' local epochs simultaneously — replacing thread parallelism
(P1 in SURVEY.md §2.8) with SPMD.

Heterogeneity handling:
* clients in a group can have different local dataset sizes -> per-step
  ``step_valid`` masks make padded steps an exact no-op (params, moments and
  the optimizer step counter are untouched), reproducing per-client
  ``len(loader)`` loop lengths;
* partial final batches (DataLoader ``drop_last=False``) -> per-sample
  ``valid`` masks inside the loss, so the mean matches torch's batch mean;
* the freeze window (``--freeze_modality``, fedavgserver.py:422-429) -> a
  static per-leaf frozen mask, compiled as a separate program variant.

Epoch boundaries live on the host (each epoch reshuffles host-side index
maps, like DataLoader(shuffle=True)); within an epoch the steps are scanned
on device in chunks of ``train_chunk_steps`` so that host->HBM feeding
(uint8 pixels / int32 token ids) overlaps compute via async dispatch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fedcola_tpu.models.mat import MATConfig, mat_apply
from fedcola_tpu.ops import losses
from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state, opt_update


@dataclass(frozen=True)
class GroupSpec:
    """Static description of one client group's local training program."""
    modality: str                  # img | txt | img+txt
    criterion: str                 # CrossEntropyLoss | ContrastiveLoss | ...
    img_slot: int = 0
    txt_slot: int = 1
    resize_to: Optional[int] = None      # device-side resize (e.g. 32->224)
    imnorm: bool = False                 # (x/255 - .5)/.5 (data.py:107-109)
    mu: float = 0.0                      # fedprox proximal coefficient
    algorithm: str = "fedavg"
    # device-side train augmentation inside the resident gather (reference
    # transforms data.py:86-134; rotation/jitter stay host-side)
    aug_resize: Optional[int] = None     # Resize((r, r)) BEFORE the crop
    aug_crop: Optional[int] = None       # RandomCrop(c, padding=4,
    #                                      pad_if_needed=True)
    aug_randhf: Optional[float] = None   # RandomHorizontalFlip(p)
    aug_randvf: Optional[float] = None   # RandomVerticalFlip(p)
    # eval-side crop (reference CenterCrop(crop) after Resize,
    # data.py:96-97): applied by preprocess_images to images that are NOT
    # already crop-sized, so train batches (pre-cropped by the random
    # crop) pass through untouched
    center_crop: Optional[int] = None

    @property
    def device_aug(self) -> bool:
        return (self.aug_crop is not None or self.aug_randhf is not None
                or self.aug_randvf is not None)


def preprocess_images(x: jnp.ndarray, spec: GroupSpec,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 NHWC pixels -> normalised float NHWC, on device.

    The reference resizes/normalises on the host inside torchvision
    transforms (data.py:86-134); moving this on-device makes the host->HBM
    transfer uint8 (4x smaller than fp32) and turns resize into cheap XLA.
    """
    x = x.astype(jnp.float32) / 255.0
    if spec.imnorm:
        x = (x - 0.5) / 0.5
    B = x.shape[0]
    # --crop configured and the image is NOT already crop-sized: this is
    # an un-augmented (eval / fedprox-global) image — apply the
    # reference's deterministic chain Resize((r,r)) -> CenterCrop(c)
    # (data.py:93-97; train batches arrive pre-cropped from the random
    # crop and skip this).  Resize/center-crop are linear and commute
    # with the normalisation above.
    if (spec.center_crop is not None
            and x.shape[1:3] != (spec.center_crop, spec.center_crop)):
        if (spec.aug_resize is not None
                and x.shape[1:3] != (spec.aug_resize, spec.aug_resize)):
            x = jax.image.resize(
                x, (B, spec.aug_resize, spec.aug_resize, x.shape[-1]),
                "bilinear")
        c = spec.center_crop
        if x.shape[1] > c and x.shape[2] > c:
            y0 = (x.shape[1] - c) // 2
            x0 = (x.shape[2] - c) // 2
            x = x[:, y0:y0 + c, x0:x0 + c, :]
    # both spatial dims: a non-square input whose height happens to match
    # must still be resized (square-ness is not an invariant of future
    # path-backed datasets)
    if (spec.resize_to is not None
            and x.shape[1:3] != (spec.resize_to, spec.resize_to)):
        x = jax.image.resize(
            x, (B, spec.resize_to, spec.resize_to, x.shape[-1]), "bilinear")
    return x.astype(dtype)


def device_augment(x: jnp.ndarray, key, crop: Optional[int],
                   randhf: Optional[float],
                   randvf: Optional[float],
                   resize: Optional[int] = None) -> jnp.ndarray:
    """Per-sample train augmentation on device, matching the host
    ``_augment`` semantics (pipeline.py) in the reference's transform
    order (data.py:93-103): Resize((r, r)) -> RandomCrop(c, padding=4,
    pad_if_needed=True) -> RandomHorizontalFlip(p) ->
    RandomVerticalFlip(p).  Runs on uint8 NHWC before
    normalisation, so augmented runs keep HBM residency instead of
    falling back to host pixel streaming."""
    B = x.shape[0]
    kc, kh, kv = jax.random.split(key, 3)
    if (crop is not None and resize is not None
            and x.shape[1:3] != (resize, resize)):
        # pixel-scale bilinear, rounded back to uint8 (the reference
        # resizes the uint8 PIL image before cropping)
        xf = jax.image.resize(
            x.astype(jnp.float32), (B, resize, resize, x.shape[-1]),
            "bilinear")
        x = jnp.clip(jnp.round(xf), 0, 255).astype(jnp.uint8)
    if crop is not None:
        x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        # pad_if_needed=True: still smaller than the crop -> pad BOTH
        # sides by the full deficit (torchvision RandomCrop semantics)
        dh = max(crop - x.shape[1], 0)
        dw = max(crop - x.shape[2], 0)
        if dh or dw:
            x = jnp.pad(x, ((0, 0), (dh, dh), (dw, dw), (0, 0)))
        H, W = x.shape[1], x.shape[2]
        kcy, kcx = jax.random.split(kc)
        ys = jax.random.randint(kcy, (B,), 0, H - crop + 1)
        xs = jax.random.randint(kcx, (B,), 0, W - crop + 1)
        x = jax.vmap(lambda im, y, xx: jax.lax.dynamic_slice(
            im, (y, xx, 0), (crop, crop, im.shape[-1])))(x, ys, xs)
    if randhf is not None:
        flip = jax.random.uniform(kh, (B,)) < randhf
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    if randvf is not None:
        flip = jax.random.uniform(kv, (B,)) < randvf
        x = jnp.where(flip[:, None, None, None], x[:, ::-1, :, :], x)
    return x


def _take_images(data, idx):
    """Row gather from HBM-resident image storage.  Array-backed datasets
    stage ``img [N, H, W, C]`` directly; path-backed retrieval sets
    (COCO/Flickr) stage a deduped unique-image ``img_store`` plus an
    ``img_row`` caption->image map (datasets.py:103-129) and the gather
    adds one int indirection — both stay pure device ops."""
    if "img_store" in data:
        return jnp.take(data["img_store"],
                        jnp.take(data["img_row"], idx, axis=0), axis=0)
    return jnp.take(data["img"], idx, axis=0)


def resident_gather(spec: GroupSpec, data, idx, valid=None):
    """Device-side batch assembly from HBM-resident dataset arrays."""
    batch = {} if valid is None else {"valid": valid}
    if spec.modality == "img":
        batch["x"] = _take_images(data, idx)
        batch["y"] = jnp.take(data["tgt"], idx, axis=0)
    elif spec.modality == "txt":
        batch["x"] = jnp.take(data["txt"], idx, axis=0)
        batch["y"] = jnp.take(data["tgt"], idx, axis=0)
    else:  # img+txt: token ids ride the target slot
        batch["x"] = _take_images(data, idx)
        batch["y"] = jnp.take(data["txt"], idx, axis=0)
    return batch


def _cls_criterion(name: str):
    """Criterion lookup by torch.nn name (reference fedavgclient.py:23,
    incl. the monkey-patched losses src/utils.py:286-315)."""
    # Seq2SeqLoss (ops.losses.seq2seq_ce) is deliberately absent: it
    # needs [B, L, V] logits, which no MAT head emits — the reference's
    # seq2seq flag only ever fires for its dead dataset branches
    # (src/utils.py:249-252); check_args rejects the criterion loudly
    return {
        "CrossEntropyLoss": losses.cross_entropy,
        "PainlessBCEWithLogitsLoss": losses.painless_bce,
        "BCEWithLogitsLoss": losses.painless_bce,
        "SegLoss": losses.seg_loss,
    }[name]


def _mm_criterion(name: str):
    """Multimodal criterion (TASK_2_CRITERION, fedavgserver.py:76-80)."""
    return {
        "ContrastiveLoss": losses.clip_contrastive,
        "MCSoftContrastiveLoss": losses.mc_soft_contrastive,
    }[name]


def _count_correct(logits, y, valid):
    """Valid-row correct count for [B, C] cls logits (MAT heads emit cls
    logits or retrieval features only, mat.py heads)."""
    return jnp.sum((jnp.argmax(logits, -1) == y) & valid)


def _route_inputs(cfg: MATConfig, spec: GroupSpec, batch, dtype):
    """Modality-routed MAT input slots for inference — the ONE routing
    shared by the central and per-client eval paths (the training twin is
    ``_local_loss``, which additionally threads train/rng).  Returns
    ``(ins, out_slot)`` where ``out_slot`` is the logits slot for
    uni-modal groups and ``None`` for img+txt (feat_out pairs)."""
    ins = [None] * len(cfg.modalities)
    if spec.modality == "img":
        ins[spec.img_slot] = preprocess_images(batch["x"], spec, dtype)
        return ins, spec.img_slot
    if spec.modality == "txt":
        ins[spec.txt_slot] = batch["x"]
        return ins, spec.txt_slot
    ins[spec.img_slot] = preprocess_images(batch["x"], spec, dtype)
    ins[spec.txt_slot] = batch["y"]          # token ids ride the target slot
    return ins, None


def _local_loss(cfg: MATConfig, spec: GroupSpec, params, batch,
                rng, global_params):
    """Modality-routed loss (reference fedavgclient.py:81-95); the slot
    routing itself is ``_route_inputs`` — the ONE routing shared with the
    eval paths."""
    dtype = jnp.dtype(cfg.compute_dtype)
    valid = batch["valid"]
    ins, out_slot = _route_inputs(cfg, spec, batch, dtype)
    if out_slot is not None:                      # uni-modal cls
        logits = mat_apply(cfg, params, ins, train=True, rng=rng)[out_slot]
        loss = _cls_criterion(spec.criterion)(logits, batch["y"], valid)
        correct = _count_correct(logits, batch["y"], valid)
    else:                                         # img+txt contrastive
        feats = mat_apply(cfg, params, ins, feat_out=True, train=True,
                          rng=rng)
        loss = _mm_criterion(spec.criterion)(feats[spec.img_slot],
                                             feats[spec.txt_slot], valid)
        correct = jnp.zeros((), jnp.int32)

    if spec.algorithm == "fedprox" and spec.mu > 0:
        loss = loss + losses.fedprox_term(params, global_params, spec.mu)
    n_valid = jnp.sum(valid)
    return loss, (correct, n_valid)


def build_frozen_mask(cfg: MATConfig, params,
                      frozen_token: Optional[Tuple[Tuple[str, ...], ...]]
                      = None):
    """Static ``requires_grad=False`` mask pytree for ``params`` (python
    bools, same structure), or None when nothing is frozen.

    ``frozen_token``: extra frozen leaf paths (the freeze-window feature).
    aux_trained=False always freezes the aux weights while keeping the
    cross_modal_scale trainable (reference mome.py:47-53: the
    CrossModalReparamLinear calls aux_weight.requires_grad_(False); wired
    via build_aux at mome.py:786).  Shared by the task-epoch program and
    the CreamFL public/distill steps — the reference runs every phase
    through the same model instance, so one requires_grad state governs
    all of them (creamflclient.py:83, creamflserver.py:303)."""
    frozen_set = set(frozen_token or ())
    if cfg.has_aux and not cfg.aux_trained:
        for kind in cfg.aux_layer_kinds:
            frozen_set.add(("aux", f"{kind}_aux"))
    if not frozen_set:
        return None

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, tuple):      # perlayer_io layer tuples
            return tuple(walk(v, path) for v in node)
        return path in frozen_set

    return walk(params, ())


@functools.lru_cache(maxsize=32)
def build_group_update(cfg: MATConfig, spec: GroupSpec, opt: OptimizerSpec,
                       frozen_token: Optional[Tuple[Tuple[str, ...], ...]] = None,
                       resident: bool = False):
    """Compile the vmapped chunk-update for one (model, group, optimizer,
    freeze-mask) combination.  ``frozen_token``: tuple of frozen leaf paths
    (hashable stand-in for the mask pytree).

    ``resident=True`` builds the **HBM-resident data plane** variant: the
    chunk carries ``idx [S, B] int32`` per client instead of gathered
    rows, and the update takes an extra ``data`` dict of whole-dataset
    device arrays (``img``/``txt``/``tgt``), shared (not vmapped) across
    clients; each scan step gathers its batch on device.  Per-round
    host->device traffic becomes indices instead of pixels."""

    def make_frozen_mask(params):
        return build_frozen_mask(cfg, params, frozen_token)

    def gather_batch(step, data, aug_rng=None):
        """Device-side row gather for the resident plane (step carries
        ``idx [B]`` + ``valid [B]``); train augmentation (crop/flips)
        applies right after the gather, per-sample, from ``aug_rng``."""
        batch = resident_gather(spec, data, step["idx"], step["valid"])
        if aug_rng is not None:
            batch["x"] = device_augment(batch["x"], aug_rng, spec.aug_crop,
                                        spec.aug_randhf, spec.aug_randvf,
                                        resize=spec.aug_resize)
        return batch

    perlayer = cfg.perlayer_io and cfg.depth > 1

    def chunk_fn(params, opt_state, chunk, rng, lr, global_params,
                 data=None):
        """chunk: dict of [S, ...] arrays + step_valid [S].  Returns updated
        (params, opt_state) and per-step (loss, correct, n_valid)."""
        if perlayer:
            # chunk-internal per-layer representation (mat.MATConfig.
            # perlayer_io): one slice pass at entry + one restack at exit
            # replaces per-step stacked-kernel slicing/relayouts; the
            # external contract (stacked trees, checkpoints, aggregation)
            # is untouched
            from fedcola_tpu.models.mat import (restack_counter_leaves,
                                                restack_layer_leaves,
                                                unstack_counter_leaves,
                                                unstack_layer_leaves)
            params = unstack_layer_leaves(cfg, params)
            global_params = unstack_layer_leaves(cfg, global_params)
            opt_state = {k: (unstack_layer_leaves(cfg, v)
                             if k in ("m", "v", "b")
                             else unstack_counter_leaves(cfg, v)
                             if k == "t" else v)
                         for k, v in opt_state.items()}
        frozen = make_frozen_mask(params)
        S = chunk["step_valid"].shape[0]
        rngs = jax.random.split(rng, S)

        def body(carry, xs):
            p, st = carry
            batch, sv, r = xs
            if resident:
                if spec.device_aug:
                    # split keeps the no-aug resident stream unchanged
                    aug_r, r = jax.random.split(r)
                    batch = gather_batch(batch, data, aug_r)
                else:
                    batch = gather_batch(batch, data)
            grad_fn = jax.value_and_grad(
                lambda pp: _local_loss(cfg, spec, pp, batch, r, global_params),
                has_aux=True)
            (loss, (correct, n_valid)), grads = grad_fn(p)
            p2, st2 = opt_update(opt, p, grads, st, lr, frozen=frozen,
                                 step_valid=sv)
            return (p2, st2), (loss, correct, n_valid)

        batches = {k: v for k, v in chunk.items() if k != "step_valid"}
        (params, opt_state), (loss_s, cor_s, nv_s) = jax.lax.scan(
            body, (params, opt_state), (batches, chunk["step_valid"], rngs))
        if perlayer:
            params = restack_layer_leaves(cfg, params)
            opt_state = {k: (restack_layer_leaves(cfg, v)
                             if k in ("m", "v", "b")
                             else restack_counter_leaves(cfg, v)
                             if k == "t" else v)
                         for k, v in opt_state.items()}
        return params, opt_state, (loss_s, cor_s, nv_s)

    if resident:
        vmapped = jax.vmap(chunk_fn, in_axes=(0, 0, 0, 0, None, None, None))
    else:
        vmapped = jax.vmap(chunk_fn, in_axes=(0, 0, 0, 0, None, None))
    return jax.jit(vmapped, donate_argnums=(0, 1))


def init_group_opt_states(opt: OptimizerSpec, stacked_params):
    """Optimizer state for a stacked [n_clients, ...] parameter tree
    (per-client step counters sized from the leading axis)."""
    n = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    return init_opt_state(opt, stacked_params, n)


# ----------------------------------------------------------------- eval ----

@functools.lru_cache(maxsize=32)
def build_eval_forward_chunked(cfg: MATConfig, spec: GroupSpec):
    """Resident-plane mm feature extraction over a [K, B] index chunk in
    ONE jitted call (``lax.scan`` over the K batches), returning
    ``(img_feats [K, B, D], txt_feats [K, B, D])``.

    Per-call dispatch can dominate eval wall time when the device hangs
    off a network relay (BENCH_NOTES "measurement methodology"); chaining
    K batches per call divides that overhead by K with identical math.
    img+txt groups only — uni-modal eval keeps ``build_eval_forward``."""
    dtype = jnp.dtype(cfg.compute_dtype)

    def fwd(params, idxs, data):
        def body(_, i):
            batch = resident_gather(spec, data, i)
            ins, _ = _route_inputs(cfg, spec, batch, dtype)
            outs = mat_apply(cfg, params, ins, feat_out=True)
            return None, (outs[spec.img_slot], outs[spec.txt_slot])

        _, (fi, ft) = jax.lax.scan(body, None, idxs)
        return fi, ft

    return jax.jit(fwd)


@functools.lru_cache(maxsize=32)
def build_eval_txt_forward_chunked(cfg: MATConfig, spec: GroupSpec):
    """Text-tower-only twin of :func:`build_eval_forward_chunked`: runs
    just the txt stack over a [K, B] index chunk of caption rows.  Used
    by the unique-image extraction split (eval.retrieval): the txt tower
    runs per caption row, the img tower per UNIQUE image — identical
    features (the MAT forward is per-sample deterministic at eval), ~3x
    fewer extraction FLOPs at 5-captions-per-image shapes."""
    def fwd(params, idxs, data):
        def body(_, i):
            ins = [None] * len(cfg.modalities)
            ins[spec.txt_slot] = jnp.take(data["txt"], i, axis=0)
            outs = mat_apply(cfg, params, ins, feat_out=True)
            return None, outs[spec.txt_slot]

        _, ft = jax.lax.scan(body, None, idxs)
        return ft

    return jax.jit(fwd)


@functools.lru_cache(maxsize=32)
def build_eval_img_store_forward_chunked(cfg: MATConfig, spec: GroupSpec):
    """Image-tower-only twin of :func:`build_eval_forward_chunked` over
    UNIQUE deduped-store rows ([K, B] indices into ``img_store``)."""
    dtype = jnp.dtype(cfg.compute_dtype)

    def fwd(params, idxs, data):
        def body(_, i):
            ins = [None] * len(cfg.modalities)
            ins[spec.img_slot] = preprocess_images(
                jnp.take(data["img_store"], i, axis=0), spec, dtype)
            outs = mat_apply(cfg, params, ins, feat_out=True)
            return None, outs[spec.img_slot]

        _, fi = jax.lax.scan(body, None, idxs)
        return fi

    return jax.jit(fwd)


@functools.lru_cache(maxsize=32)
def build_eval_forward(cfg: MATConfig, spec: GroupSpec,
                       resident: bool = False):
    """Jitted inference forward for central/local evaluation.

    ``resident=True``: ``batch`` is ``{"idx": [B] int32}`` and a ``data``
    dict of HBM-resident dataset arrays is passed alongside — rows gather
    on device (eval twin of the resident training plane)."""

    def fwd(params, batch, data=None):
        dtype = jnp.dtype(cfg.compute_dtype)
        if resident:
            batch = resident_gather(spec, data, batch["idx"])
        ins, slot = _route_inputs(cfg, spec, batch, dtype)
        if slot is not None:
            return mat_apply(cfg, params, ins)[slot]
        outs = mat_apply(cfg, params, ins, feat_out=True)
        return outs[spec.img_slot], outs[spec.txt_slot]

    return jax.jit(fwd)


@functools.lru_cache(maxsize=32)
def build_local_eval(cfg: MATConfig, spec: GroupSpec):
    """Batched per-client holdout evaluation on the resident plane.

    The reference's per-client eval is broken for MAT
    (``self.model(inputs, task=...)``, fedavgclient.py:140) and would run
    one client at a time in a thread anyway; here ALL of a dataset's
    evaluated clients run as one jitted program —
    ``vmap(clients)[lax.scan(batches)]`` over the shared global params and
    HBM-resident dataset arrays — returning per-client device accumulators
    (loss*count sum, correct count, valid count) with one readback total.
    Padded steps/rows are masked no-ops; accumulation mirrors
    ``MetricManager.track``'s loss*n weighting (src/utils.py:339,347).
    """
    dtype = jnp.dtype(cfg.compute_dtype)

    def client_fn(params, idx, valid, data):
        def body(carry, xs):
            ls, cs, ns = carry
            i, v = xs
            batch = resident_gather(spec, data, i, v)
            ins, slot = _route_inputs(cfg, spec, batch, dtype)
            if slot is None:
                outs = mat_apply(cfg, params, ins, feat_out=True)
                loss = _mm_criterion(spec.criterion)(
                    outs[spec.img_slot], outs[spec.txt_slot], v)
                correct = jnp.zeros((), jnp.int32)
            else:
                logits = mat_apply(cfg, params, ins)[slot]
                # per-client eval loss is CE regardless of the training
                # criterion (matches the serial path / reference intent)
                loss = losses.cross_entropy(logits, batch["y"], v)
                correct = _count_correct(logits, batch["y"], v)
            nv = jnp.sum(v).astype(jnp.float32)
            return (ls + loss * nv, cs + correct.astype(jnp.float32),
                    ns + nv), None

        init = (jnp.float32(0), jnp.float32(0), jnp.float32(0))
        (ls, cs, ns), _ = jax.lax.scan(body, init, (idx, valid))
        return ls, cs, ns

    return jax.jit(jax.vmap(client_fn, in_axes=(None, 0, 0, None)))
