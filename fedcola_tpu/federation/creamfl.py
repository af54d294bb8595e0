"""CreamFL (reference ``src/server/creamflserver.py`` +
``src/client/creamflclient.py``): cross-modal representation-level
federated learning over a public COCO subset.

Round recipe (creamflserver.py:338-435):
1. ``_generate_public_logit`` — the mm global model embeds the public set
   (last ``--num_pub_samples`` of coco_train_ids, creamflserver.py:100-126)
   into ``global_img_feature`` / ``global_txt_feature``;
2. client updates: after **each** local epoch, a public-set representation
   pass (creamflclient.py:131-237): uni-modal clients minimise an
   inter-modal contrastive CE against the other modality's global features
   plus a MOON-style pos/neg term vs the round-start model; mm clients an
   intra+inter combination (skipped with ``--no_mm_contrastive``);
   temperature 0.5, grad-clip hardcoded to 2;
3. uni-modal clients extract their public features
   (creamflclient.py:38-68);
4. server aggregates client public features with contrastive weighting
   (softmax over per-client diagonal log-probs vs the global features of
   the other modality, creamflserver.py:355-404);
5. the mm model aggregates with CreamFL's zero-init weighted sum
   (creamflserver.py:251-292) then distils on the public set
   (AdamW ``--p_lr``, MSE ``code_sim`` x ``--kd_weight``, fresh optimizer
   every round, clip 2, creamflserver.py:293-336);
6. uni-modal models aggregate with the parent's plain fedavg
   (creamflserver.py:418-423).

TPU re-architecture: the public set is materialised once as device arrays;
every public pass (client contrastive epochs, feature extraction, server
distillation) is a jitted batched program; the per-epoch client programs
share the stacked parameter/optimizer trees with the task-epoch program so
Adam moments carry across phases exactly like the single torch optimizer
instance does (creamflclient.py:84).
"""

from __future__ import annotations

import functools
import logging
import time
from collections import defaultdict
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from fedcola_tpu.config import DATASET_2_MODALITY, DATASET_2_TASK
from fedcola_tpu.data.datasets import fetch_coco_public, fetch_synthetic
from fedcola_tpu.data.pipeline import GroupFeeder, Prefetcher
from fedcola_tpu.data.sampling import sample_clients
from fedcola_tpu.federation import aggregate as agg
from fedcola_tpu.federation.server import FedAvgServer, _broadcast_stack
from fedcola_tpu.models.mat import mat_apply
from fedcola_tpu.ops.losses import cross_entropy
from fedcola_tpu.parallel.client_update import (build_frozen_mask,
                                                init_group_opt_states,
                                                preprocess_images)
from fedcola_tpu.parallel.optim import (OptimizerSpec, init_opt_state,
                                        opt_update)

logger = logging.getLogger(__name__)

PUB_TEMPERATURE = 0.5  # hardcoded in the reference (creamflclient.py:166+)


class CreamflServer(FedAvgServer):
    def __init__(self, cfg, data, writer=None):
        super().__init__(cfg, data, writer)
        try:
            self.mm_dataset = next(ds for ds in cfg.client_datasets
                                   if DATASET_2_MODALITY[ds] == "img+txt")
        except StopIteration:
            raise ValueError(
                "--algorithm creamfl requires an img+txt client dataset "
                "(the public set / KD distillation train the multimodal "
                f"global model); got --datasets {list(cfg.client_datasets)}"
            ) from None
        self._load_pub_set()
        self.g_img = None
        self.g_txt = None
        # per-INSTANCE jit caches: a class-level @lru_cache on these
        # bound methods would key entries on `self` and keep discarded
        # servers' entire device state (pinned pub batches, global
        # params) alive for the cache's lifetime; instance-level wrapping
        # forms a self-cycle the gc can collect with the server
        for m in ("_build_pub_embed", "_build_pub_update",
                  "_build_pub_extract", "_build_distill_step"):
            setattr(self, m, functools.lru_cache(maxsize=8)(getattr(self, m)))

    # ------------------------------------------------------------ pub data --

    def _load_pub_set(self):
        cfg = self.cfg
        try:
            if cfg.synthetic_data:
                raise FileNotFoundError
            tok = self.data.tokenizers.get(self.mm_dataset)
            ds = fetch_coco_public(cfg.pub_data_dir, cfg.pub_anno_path, tok,
                                   cfg.seq_len, cfg.num_pub_samples,
                                   image_size=cfg.resize or 224)
            ds.materialize_images()
            idx = np.arange(ds.n)
        except (FileNotFoundError, OSError, KeyError) as e:
            if not cfg.synthetic_data:
                # same loud banner contract as the main loader
                # (loaders.py): a mistyped --pub_anno_path must not
                # silently train every contrastive/KD phase on noise
                logger.warning(
                    "=== SYNTHETIC DATA === CreamFL public set: could not "
                    "load real COCO public data (%s: %s); falling back to "
                    "a synthetic public set — results are NOT meaningful "
                    "for real runs (check --pub_data_dir/--pub_anno_path)",
                    type(e).__name__, e)
            mm_cfg = self.model_cfgs[self.mm_dataset]
            n = cfg.num_pub_samples - cfg.num_pub_samples % 5
            ds = fetch_synthetic("Coco", "img+txt", "rtv", max(n, 5), None,
                                 img_hw=mm_cfg.img_size, seq_len=cfg.seq_len,
                                 vocab_size=mm_cfg.vocab_size,
                                 seed=999)
            idx = np.arange(ds.n)
        self.pub_images = ds.load_images(idx)             # uint8 [N, H, W, C]
        self.pub_texts = ds.texts[idx]                    # int32 [N, L]
        self.n_pub = len(idx)
        logger.info("[CREAMFL] public set: %d samples", self.n_pub)

    def _pub_batch_list(self):
        """Host-side (numpy) public-set batches, padded to pub_batch_size."""
        B = self.cfg.pub_batch_size
        out = []
        from fedcola_tpu.utils.dispatch import pad_batch_indices
        for s in range(0, self.n_pub, B):
            e = min(s + B, self.n_pub)
            sel = pad_batch_indices(np.arange(s, e), B)
            valid = np.zeros((B,), bool); valid[:e - s] = True
            out.append({"img": self.pub_images[sel],
                        "txt": self.pub_texts[sel],
                        "didx": sel.astype(np.int32), "valid": valid})
        return out

    def _pub_batches(self):
        """Public-set batches, staged to device ONCE and reused: the pub
        set is identical every epoch and round, so re-shipping its pixels
        across the host link each pass would be pure waste (the host link
        is the slowest wire — see FedAvgServer._resident_data).  The
        staging honors the same HBM budget as the resident data plane
        (FEDCOLA_RESIDENT_BUDGET): a large --num_pub_samples falls back to
        per-pass host feeding instead of silently hoarding HBM for the
        whole run; finalize() frees the pinned batches either way."""
        if getattr(self, "_pub_batches_dev", None) is not None:
            yield from self._pub_batches_dev
            return
        batches = self._pub_batch_list()
        total = sum(b["img"].nbytes + b["txt"].nbytes for b in batches)
        if total <= self.resident_budget_left():
            self._pub_batches_dev = [jax.device_put(b) for b in batches]
            self._resident_bytes += total
            self._pub_pinned_bytes = total
            yield from self._pub_batches_dev
            return
        if not getattr(self, "_pub_host_logged", False):
            self._pub_host_logged = True
            logger.info("[CREAMFL] public set stays host-fed per pass "
                        "(%.2f GB > %.2f GB remaining of the resident "
                        "budget)", total / 1e9,
                        self.resident_budget_left() / 1e9)
        for b in batches:
            yield jax.device_put(b)

    # ------------------------------------------------- global pub features --

    def _build_pub_embed(self):
        """jitted mm public-set embed; built once (a fresh @jax.jit per
        round would retrace + recompile every round)."""
        mcfg = self.model_cfgs[self.mm_dataset]
        spec = self._group_spec(self.mm_dataset)

        def fwd(params, img, txt):
            x = preprocess_images(img, spec, jnp.dtype(mcfg.compute_dtype))
            outs = mat_apply(mcfg, params, [x, txt], feat_out=True)
            return outs[0], outs[1]

        return jax.jit(fwd)

    def _generate_public_logit(self):
        """creamflserver.py:128-162: mm global model embeds the public set."""
        params = self.global_params[self.mm_dataset]
        fwd = self._build_pub_embed()

        gi, gt = [], []
        for b in self._pub_batches():
            fi, ft = fwd(params, b["img"], b["txt"])
            n = int(b["valid"].sum())
            gi.append(self.mesh_plan.to_host(fi)[:n])
            gt.append(self.mesh_plan.to_host(ft)[:n])
        self.g_img = jnp.asarray(np.concatenate(gi))
        self.g_txt = jnp.asarray(np.concatenate(gt))

    # --------------------------------------------------- client pub phases --

    def _build_pub_update(self, ds: str, frozen_token=None):
        """Vmapped one-batch public contrastive step for the group of
        dataset ``ds`` (creamflclient.py:131-237).  ``frozen_token``: the
        same freeze-window leaf paths as the task-epoch program — the
        reference runs both phases through one model instance, so a
        requires_grad=False param is excluded from BOTH graphs."""
        mcfg = self.model_cfgs[ds]
        spec = self._group_spec(ds)
        modality = spec.modality
        w = self.cfg.interintra_weight
        pub_opt = OptimizerSpec(
            name=self.opt_spec.name, weight_decay=self.opt_spec.weight_decay,
            momentum=self.opt_spec.momentum, nesterov=self.opt_spec.nesterov,
            max_grad_norm=2.0)  # hardcoded clip (creamflclient.py:238)
        # the pub loss is feat_out-only, so cls heads get grad None in
        # torch and AdamW SKIPS them — no param move, no moment decay, no
        # step-count advance (shared optimizer across phases,
        # creamflclient.py:83) — while our jax.grad would hand back
        # explicit zeros and apply the momentum tail.  Freeze them in
        # this program only.
        head_paths = tuple(
            ("head", str(i), leaf)
            for i, task in enumerate(mcfg.tasks) if task == "cls"
            for leaf in ("kernel", "bias"))
        frozen_token = tuple(sorted(set(frozen_token or ()) |
                                    set(head_paths))) or None
        dtype = jnp.dtype(mcfg.compute_dtype)

        def feats(params, img, txt, train, rng):
            ins = [None] * len(mcfg.modalities)
            if "img" in modality:
                ins[spec.img_slot] = preprocess_images(img, spec, dtype)
            if "txt" in modality:
                ins[spec.txt_slot] = txt
            return mat_apply(mcfg, params, ins, feat_out=True,
                             train=train, rng=rng)

        def loss_fn(params, old_params, batch, g_img, g_txt, rng):
            img, txt = batch["img"], batch["txt"]
            didx, valid = batch["didx"], batch["valid"]
            t = PUB_TEMPERATURE
            if modality == "img":
                f = feats(params, img, None, True, rng)[spec.img_slot]
                f_old = jax.lax.stop_gradient(
                    feats(old_params, img, None, False, None)[spec.img_slot])
                target = g_img[didx]
                logits_inter = (f @ g_txt.T) / t
            elif modality == "txt":
                f = feats(params, None, txt, True, rng)[spec.txt_slot]
                f_old = jax.lax.stop_gradient(
                    feats(old_params, None, txt, False, None)[spec.txt_slot])
                target = g_txt[didx]
                logits_inter = (f @ g_img.T) / t
            else:
                outs = feats(params, img, txt, True, rng)
                fi, ft = outs[spec.img_slot], outs[spec.txt_slot]
                old = feats(old_params, img, txt, False, None)
                oi = jax.lax.stop_gradient(old[spec.img_slot])
                ot = jax.lax.stop_gradient(old[spec.txt_slot])
                ti, tt = g_img[didx], g_txt[didx]
                pos_i = jnp.sum(fi * ti, -1, keepdims=True)
                pos_t = jnp.sum(ft * tt, -1, keepdims=True)
                neg_i = jnp.sum(fi * oi, -1, keepdims=True)
                neg_t = jnp.sum(ft * ot, -1, keepdims=True)
                logits = jnp.concatenate(
                    [jnp.concatenate([pos_i, neg_i], 1),
                     jnp.concatenate([pos_t, neg_t], 1)], 0) / t
                labels = jnp.zeros((logits.shape[0],), jnp.int32)
                valid2 = jnp.concatenate([valid, valid])
                loss_intra = cross_entropy(logits, labels, valid2)
                li = (fi @ g_txt.T) / t
                lt = (ft @ g_img.T) / t
                loss_inter = cross_entropy(li, didx, valid) \
                    + cross_entropy(lt, didx, valid)
                return (loss_intra + loss_inter) * w
            labels_inter = didx
            loss_inter = cross_entropy(logits_inter, labels_inter, valid)
            pos = jnp.sum(f * target, -1, keepdims=True)
            neg = jnp.sum(f * f_old, -1, keepdims=True)
            logits_moon = jnp.concatenate([pos, neg], 1) / t
            loss_moon = cross_entropy(
                logits_moon, jnp.zeros((f.shape[0],), jnp.int32), valid)
            return (loss_moon + loss_inter) * w

        def step(params, opt_state, old_params, batch, g_img, g_txt,
                 rng, lr):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, old_params, batch, g_img, g_txt, rng)
            params, opt_state = opt_update(
                pub_opt, params, grads, opt_state, lr,
                frozen=build_frozen_mask(mcfg, params, frozen_token))
            return params, opt_state, loss

        vm = jax.vmap(step, in_axes=(0, 0, None, None, None, None, 0, None))
        return jax.jit(vm, donate_argnums=(0, 1))

    def _build_pub_extract(self, ds: str):
        """Batched public feature extraction for one uni-modal group
        (creamflclient.py:38-68)."""
        mcfg = self.model_cfgs[ds]
        spec = self._group_spec(ds)
        dtype = jnp.dtype(mcfg.compute_dtype)

        def fwd(params, img, txt):
            ins = [None] * len(mcfg.modalities)
            if spec.modality == "img":
                ins[spec.img_slot] = preprocess_images(img, spec, dtype)
                return mat_apply(mcfg, params, ins,
                                 feat_out=True)[spec.img_slot]
            ins[spec.txt_slot] = txt
            return mat_apply(mcfg, params, ins, feat_out=True)[spec.txt_slot]

        return jax.jit(jax.vmap(fwd, in_axes=(0, None, None)))

    def _train_group(self, ds: str, ids: List[int]):
        """Task epochs interleaved with public contrastive passes
        (creamflclient.py:86-237), then public feature extraction."""
        from fedcola_tpu.parallel.client_update import build_group_update
        cfg, mcfg = self.cfg, self.model_cfgs[ds]
        spec = self._group_spec(ds)
        n = len(ids)
        n_pad = self._pad_to_mesh(n)
        stacked = self._shard_clients(
            _broadcast_stack(self.global_params[ds], n_pad))
        opt_state = init_group_opt_states(self.opt_spec, stacked)
        pub_fn = self._build_pub_update(ds, self._frozen_token(ds))
        gp = self.global_params[ds]
        shards = [self.data.client_shards[i] for i in ids]
        # HBM-resident task data when eligible (pub phases interleave per
        # epoch, so epochs stream one at a time, unlike the fedavg path);
        # aug routing shared with the FedAvg path: crop/flips stay on
        # device inside the resident gather, rot/jitter evict to host
        spec, aug, data_dev = self._group_aug_plan(ds, spec)
        feeder = GroupFeeder(shards, cfg.B, spec.modality,
                             chunk_steps=cfg.train_chunk_steps,
                             shuffle=not cfg.no_shuffle,
                             rng=self.shuffle_rng,
                             debug_two_batches=cfg.debug, aug=aug)
        update_fn = build_group_update(mcfg, spec, self.opt_spec,
                                       self._frozen_token(ds),
                                       resident=data_dev is not None)
        do_pub = cfg.interintra_weight > 0 and not (
            cfg.no_mm_contrastive and spec.modality == "img+txt")
        # on-device metric accumulators (one readback per group per round)
        acc = self._init_metric_acc(n_pad)
        for _ in range(cfg.E):
            epoch_it = (feeder.round_index_chunks(1) if data_dev is not None
                        else feeder.epoch_chunks())
            for chunk in Prefetcher(epoch_it):
                chunk = self.mesh_plan.shard_chunk(
                    self._pad_chunk(chunk, n, n_pad))
                self.key, k = jax.random.split(self.key)
                rngs = self._shard_clients(jax.random.split(k, n_pad))
                if data_dev is not None:
                    stacked, opt_state, (ls, cs, ns) = update_fn(
                        stacked, opt_state, chunk, rngs,
                        jnp.float32(self.curr_lr), gp, data_dev)
                else:
                    stacked, opt_state, (ls, cs, ns) = update_fn(
                        stacked, opt_state, chunk, rngs,
                        jnp.float32(self.curr_lr), gp)
                acc = self._accumulate_metrics(acc, ls, cs, ns)
            if do_pub:
                for b in self._pub_batches():
                    self.key, k = jax.random.split(self.key)
                    rngs = self._shard_clients(jax.random.split(k, n_pad))
                    stacked, opt_state, _ = pub_fn(
                        stacked, opt_state, gp, b, self.g_img, self.g_txt,
                        rngs, jnp.float32(self.curr_lr))

        # public features of uni-modal clients (creamflserver.py:179-180)
        if spec.modality != "img+txt":
            extract = self._build_pub_extract(ds)
            fs = []
            for b in self._pub_batches():
                f = extract(stacked, b["img"], b["txt"])
                fs.append(self.mesh_plan.to_host(f)
                          [:, :int(b["valid"].sum())])
            self._pub_feats.update(
                {cid: jnp.asarray(np.concatenate([f[j] for f in fs], 0))
                 for j, cid in enumerate(ids)})

        from fedcola_tpu.federation.aux import fold_aux_into_upload
        upload = fold_aux_into_upload(mcfg, stacked)
        # shared readback + numerics sanitizer (task-epoch losses; the
        # pub-phase losses are not tracked upstream either)
        return upload, self._readback_group_metrics(acc, ds, ids)

    # ------------------------------------------------ feature aggregation ---

    @staticmethod
    @jax.jit
    def _contrastive_weighted(vecs, g_other):
        """Softmax over clients of diagonal log-probs
        (creamflserver.py:369-397).  vecs: [n_clients, N_pub, D]."""
        logits = jnp.einsum("cnd,md->cnm", vecs, g_other)
        diag = jnp.diagonal(logits, axis1=1, axis2=2) \
            - jax.nn.logsumexp(logits, axis=2)
        wts = jax.nn.softmax(diag, axis=0)              # [n_clients, N_pub]
        return jnp.sum(vecs * wts[..., None], axis=0)

    # -------------------------------------------------------- distillation --

    def _build_distill_step(self):
        """jitted KD step; built once per server (a fresh @jax.jit per
        round would retrace + recompile every round).  The reference
        creates a fresh torch optimizer every round (creamflserver.py:303:
        ``torch.optim.AdamW(params, lr=p_lr)`` — torch's **default
        weight_decay 0.01** applies) — zero-initialised moments each call
        of :meth:`_distill` reproduce that.

        The distilled representation is the reference's literal
        ``code_sim`` input: the mm forward WITHOUT feat_out runs the rtv
        head over the full sequence (per-token L2 normalisation,
        mome.py:651-659) and ``code_sim`` sums the 3D output over tokens
        (creamflserver.py:314-318) before the MSE against the aggregated
        client features."""
        cfg = self.cfg
        mcfg = self.model_cfgs[self.mm_dataset]
        spec = self._group_spec(self.mm_dataset)
        dtype = jnp.dtype(mcfg.compute_dtype)
        opt = OptimizerSpec(name="AdamW", max_grad_norm=2.0,
                            weight_decay=0.01)

        def loss_fn(params, batch, ti, tt, rng):
            x = preprocess_images(batch["img"], spec, dtype)
            outs = mat_apply(mcfg, params, [x, batch["txt"]],
                             train=True, rng=rng, seq_feat_out=True)
            out_i = jnp.sum(outs[0], axis=1)      # code_sim token sum
            out_t = jnp.sum(outs[1], axis=1)
            v = batch["valid"][:, None].astype(jnp.float32)
            nv = jnp.maximum(jnp.sum(batch["valid"]), 1)
            mse_i = jnp.sum(jnp.square(out_i - ti) * v) / (nv * ti.shape[-1])
            mse_t = jnp.sum(jnp.square(out_t - tt) * v) / (nv * tt.shape[-1])
            return cfg.kd_weight * (mse_i + mse_t)

        @jax.jit
        def step(params, opt_state, batch, ti, tt, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, ti, tt,
                                                      rng)
            # torch skips requires_grad=False params entirely (p.grad is
            # None) — with weight decay live, frozen aux weights must not
            # decay here either
            params, opt_state = opt_update(
                opt, params, grads, opt_state, jnp.float32(cfg.p_lr),
                frozen=build_frozen_mask(mcfg, params))
            return params, opt_state, loss

        return opt, step

    def _distill(self, img_vec, txt_vec):
        """Server KD on the public set (creamflserver.py:293-336)."""
        ds = self.mm_dataset
        opt, step = self._build_distill_step()
        params = self.global_params[ds]
        opt_state = init_opt_state(opt, params)

        for b in self._pub_batches():
            ti = img_vec[b["didx"]]
            tt = txt_vec[b["didx"]]
            self.key, k = jax.random.split(self.key)
            params, opt_state, _ = step(params, opt_state, b, ti, tt, k)
        self.global_params[ds] = params

    # --------------------------------------------------------------- round --

    def update(self):
        cfg = self.cfg
        t0 = time.time()
        from fedcola_tpu.utils.profiling import Timer
        timer = Timer()
        with timer.section("pub_logit"):
            self._generate_public_logit()
        self._pub_feats: Dict[int, jnp.ndarray] = {}

        sampled = sample_clients(
            self.sampler, self.client_dataset_of, self.client_modality_of,
            cfg.client_datasets, self.Cs, cfg.C, cfg.equal_sampled,
            self.round, cfg.warmup_modality, cfg.warmup_rounds)
        if not sampled:
            return []
        groups: Dict[str, List[int]] = defaultdict(list)
        for i in sampled:
            groups[self.clients[i].dataset].append(i)
        updated_sizes = {i: self.clients[i].n_train for i in sampled}

        uploads, round_metrics = {}, {}
        with timer.section("train"):
            for ds, ids in groups.items():
                uploads[ds], m = self._train_group(ds, ids)
                round_metrics.update(m)
        # training-loss cohort summary, same record the FedAvg round
        # writes (reference _log_results runs for every algorithm,
        # fedavgserver.py:362-379)
        self._record_update_summary(sampled, round_metrics, updated_sizes)

        # contrastive-weighted public feature aggregation
        img_ids = [i for i in sampled if self.clients[i].modality == "img"]
        txt_ids = [i for i in sampled if self.clients[i].modality == "txt"]
        img_vec = txt_vec = None
        if img_ids:
            vecs = jnp.stack([self._pub_feats[i] for i in img_ids])
            img_vec = self._contrastive_weighted(vecs, self.g_txt)
        if txt_ids:
            vecs = jnp.stack([self._pub_feats[i] for i in txt_ids])
            txt_vec = self._contrastive_weighted(vecs, self.g_img)

        group_members = self._padded_group_members(groups)
        client_cfgs = {ds: self.model_cfgs[ds] for ds in groups}
        exp_modalities = cfg.modalities or [DATASET_2_MODALITY[d]
                                            for d in cfg.client_datasets]
        with timer.section("aggregate"):
            for ds in self.global_params:
                is_mm = DATASET_2_MODALITY[ds] == "img+txt"
                jobs, weights = agg.plan_aggregation(
                    ds, self.model_cfgs[ds], client_cfgs, self.clients,
                    sampled, updated_sizes, self.param_scope,
                    exp_modalities, group_members,
                    compensation=cfg.compensation and is_mm,
                    share_scope=cfg.share_scope, fedavg=not is_mm,
                    creamfl=is_mm, zero_init=is_mm,
                    model_modality=DATASET_2_MODALITY[ds],
                    model_task=DATASET_2_TASK[ds])
                self.global_params[ds] = agg.apply_aggregation(
                    jobs, weights, self.global_params[ds], uploads)

        if img_vec is not None and txt_vec is not None:
            with timer.section("distill"):
                self._distill(img_vec, txt_vec)
        else:
            logger.warning("[CREAMFL] skipping distillation: missing %s "
                           "client features",
                           "img" if img_vec is None else "txt")
        # multi-process: aggregation/distill outputs may carry sharded
        # layouts; re-replicate so the process-0-gated checkpoint can
        # serialize (same as FedAvgServer.update; no-op single-process)
        self.global_params = {
            ds: self.mesh_plan.ensure_addressable(p)
            for ds, p in self.global_params.items()}
        # same hard numerics guard as the FedAvg round (the default
        # non-finite-loss path only warns; corruption must not reach the
        # next round / checkpoints through this subclass either)
        self._assert_global_finite()

        if self.round % cfg.lr_decay_step == 0:
            self.curr_lr *= cfg.lr_decay

        dt = time.time() - t0
        self.results[self.round]["round_seconds"] = dt
        self.results[self.round]["round_sections"] = dict(timer.sections)
        logger.info("[CREAMFL] [Round %04d] %d clients in %d groups, "
                    "%.2fs (%s)", self.round, len(sampled), len(groups),
                    dt, timer.summary())
        return sampled

    def finalize(self):
        # release the device-pinned public batches + global pub features
        # before checkpointing — they are training-only state
        self._pub_batches_dev = None
        self._resident_bytes -= getattr(self, "_pub_pinned_bytes", 0)
        self._pub_pinned_bytes = 0
        self.g_img = self.g_txt = None
        super().finalize()
