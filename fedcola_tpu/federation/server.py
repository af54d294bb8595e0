"""FedAvg server / round orchestrator (reference ``FedavgServer``,
src/server/fedavgserver.py:117-898) — TPU re-architecture.

Control flow per round (compare ``update()``, fedavgserver.py:784-856):

1. sample clients (equal_sampled / warmup filtering);
2. **batched local updates**: sampled clients grouped by dataset; one
   vmapped+scanned program per group replaces the reference's thread pool;
   download = on-device broadcast of the global pytree (no deepcopy), upload
   = the trained stacked pytree staying on device;
3. aux fold-in for uni-modal with_aux groups (fedavgclient.py:158-184);
4. per-dataset aggregation = host-planned, device-fused weighted reduction
   (federation/aggregate.py), optional ``--fedavg_eval`` pre-pass;
5. FedCola aux exchange (fedavgserver.py:821-845);
6. lr decay (``curr_lr *= lr_decay`` every ``lr_decay_step`` rounds).

FedProx (src/client/fedproxclient.py) is the same machinery with the
proximal term enabled in the loss; FedIoT is a config alias
(shared_param=blocks, share_scope=modality_exact — the reference's fediot
modules are missing, README.md:70 documents the rule; SURVEY.md §7).
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fedcola_tpu.config import (DATASET_2_MODALITY, DATASET_2_TASK,
                                ExperimentConfig, TASK_2_CRITERION)
from fedcola_tpu.data.loaders import FederatedData
from fedcola_tpu.data.pipeline import GroupFeeder, Prefetcher
from fedcola_tpu.data.sampling import sample_clients
from fedcola_tpu.eval import retrieval
from fedcola_tpu.federation import aggregate as agg
from fedcola_tpu.federation.aux import exchange_aux_weights, fold_aux_into_upload
from fedcola_tpu.models import naming
from fedcola_tpu.models.registry import create_model
from fedcola_tpu.parallel.client_update import (GroupSpec, build_eval_forward,
                                                build_group_update,
                                                init_group_opt_states)
from fedcola_tpu.parallel.optim import make_optimizer_spec
from fedcola_tpu.utils.metrics import MetricManager

logger = logging.getLogger(__name__)


def _broadcast_stack(params, n: int):
    """'download': one global pytree -> a stacked [n, ...] client tree."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape) + 0, params)


class FedAvgServer:
    def __init__(self, cfg: ExperimentConfig, data: FederatedData,
                 writer=None):
        self.cfg = cfg
        self.data = data
        self.writer = writer
        self.round = 0
        self.curr_lr = cfg.lr
        self.results: Dict = defaultdict(dict)
        self.opt_spec = make_optimizer_spec(cfg)
        # stateless per-round sampling: sample_clients derives its rng
        # from (seed, round, eval_mode), so resume reproduces cohorts
        self.sampler = int(cfg.seed)
        self.shuffle_rng = np.random.RandomState(cfg.seed + 1)
        self.key = jax.random.PRNGKey(cfg.seed)

        # device mesh (SURVEY.md §2.8 P1/P3/P4: replaces the reference's
        # thread pool + DataParallel + round-robin CUDA placement).  The
        # ``clients`` axis shards stacked client trees; an optional ``data``
        # axis (--mesh_shape 4 2 --mesh_axes clients data) adds intra-client
        # batch parallelism; eval batches shard over the flattened mesh.
        from fedcola_tpu.parallel.mesh import MeshPlan
        self.mesh_plan = MeshPlan.build(cfg.mesh_shape, cfg.mesh_axes)
        if self.mesh_plan.model_axis > 1 and cfg.use_pallas:
            # the fused kernels are per-device programs (custom_vmap over
            # clients); tensor-parallel weight shards require the XLA path
            # where the partitioner can insert the Megatron psums
            logger.warning("[MESH] model (TP) axis active: disabling the "
                           "fused Pallas kernels (TP partitions the XLA "
                           "path)")
            cfg.use_pallas = False
        self._resident_cache: Dict[str, Optional[Dict]] = {}
        self._resident_bytes = 0           # HBM pinned by all stagings
        self._aug_host_logged: set = set()
        self.mesh = self.mesh_plan.mesh
        if self.mesh is not None:
            logger.info("[MESH] %s over %d devices",
                        dict(self.mesh.shape), self.mesh.size)

        # one global model per client dataset (fedavgserver.py:144-158)
        self.model_cfgs = {}
        self.global_params = {}
        for ds in cfg.client_datasets:
            self.key, k = jax.random.split(self.key)
            mcfg, params = create_model(cfg.model_name, cfg, ds, k)
            self.model_cfgs[ds] = mcfg
            self.global_params[ds] = params

        # scope table over the union of model param names
        # (fedavgserver.py:190-238)
        union: List[str] = []
        for mcfg in self.model_cfgs.values():
            for _, n in naming.param_names(mcfg):
                if n not in union:
                    union.append(n)
        self.param_scope = naming.build_param_scope(
            union, cfg.shared_param, cfg.share_scope)

        # per-dataset sampling fractions (fedavgserver.py:137-142)
        self.Cs = {ds: c for ds, c in zip(cfg.client_datasets, cfg.Cs)}

        self.clients = data.client_meta
        self.client_dataset_of = [data.client_meta[i].dataset
                                  for i in range(data.K)]
        self.client_modality_of = [data.client_meta[i].modality
                                   for i in range(data.K)]


    # ---------------------------------------------------------------- util --

    def _train_dataset(self, ds: str):
        """The one shared TaskDataset behind a dataset's client shards.
        All of a dataset's clients view the same object (loaders.py builds
        one ``train`` per dataset); the resident plane stages *that* object,
        so the invariant is asserted rather than assumed.  Cached after the
        first call: callers run per-group (and, in the serial local-eval
        fallback, per-client) every round, and the K-length scan would make
        that O(K^2) host work at large K."""
        cache = getattr(self, "_train_dataset_cache", None)
        if cache is None:
            cache = self._train_dataset_cache = {}
        if ds not in cache:
            shards = [self.data.client_shards[i] for i in range(self.data.K)
                      if self.client_dataset_of[i] == ds]
            first = shards[0].dataset
            assert all(s.dataset is first for s in shards), (
                f"clients of dataset {ds!r} hold distinct TaskDataset "
                "objects; the resident data plane requires the "
                "shared-dataset layout loaders.load_federated_data builds")
            cache[ds] = first
        return cache[ds]

    def _group_aug_plan(self, ds: str, spec):
        """Decide a group's augmentation routing (shared by the FedAvg and
        CreamFL train paths): returns ``(spec, aug, data_dev)``.  Crop and
        flips run on device inside the resident gather
        (client_update.device_augment) and keep the HBM-resident plane;
        rotation/color-jitter are host-side transforms, so those flags
        fall back to host-fed pixels (logged once per dataset).
        Reference transforms: data.py:86-134."""
        cfg = self.cfg
        from fedcola_tpu.data.pipeline import AugmentSpec
        aug = AugmentSpec(resize=cfg.resize, crop=cfg.crop,
                          randrot=cfg.randrot,
                          randhf=cfg.randhf, randvf=cfg.randvf,
                          randjit=cfg.randjit)
        aug = aug if ("img" in spec.modality and aug.active) else None
        data_dev = None
        if aug is None:
            data_dev = self._resident_data(ds, spec)
        elif aug.device_supported:
            data_dev = self._resident_data(ds, spec)
            if data_dev is not None:
                import dataclasses
                spec = dataclasses.replace(
                    spec, aug_resize=aug.resize, aug_crop=aug.crop,
                    aug_randhf=aug.randhf, aug_randvf=aug.randvf)
                aug = None
        elif ds not in self._aug_host_logged:
            self._aug_host_logged.add(ds)
            logger.info("[DATA] %s: --randrot/--randjit are host-side "
                        "transforms; group runs host-fed (crop/flips alone "
                        "would keep the HBM-resident plane)", ds)
        return spec, aug, data_dev

    def _group_spec(self, ds: str) -> GroupSpec:
        modality = DATASET_2_MODALITY[ds]
        task = DATASET_2_TASK[ds]
        criterion = TASK_2_CRITERION["img+txt"] if modality == "img+txt" \
            else self.cfg.criterion
        train_ds = self._train_dataset(ds)
        native = None
        if train_ds.images is not None:
            native = train_ds.images.shape[1]
        elif train_ds.image_size:
            native = train_ds.image_size
        resize_to = self.model_cfgs[ds].img_size \
            if (("img" in modality) and native
                and native != self.model_cfgs[ds].img_size) else None
        # --crop: eval images get the reference's deterministic
        # Resize -> CenterCrop(crop) (data.py:93-97) via
        # preprocess_images; train batches are random-cropped by the
        # augmentation path and pass through it untouched
        cc = self.cfg.crop if "img" in modality else None
        return GroupSpec(modality=modality, criterion=criterion,
                         resize_to=resize_to, imnorm=self.cfg.imnorm,
                         mu=self.cfg.mu, algorithm=self.cfg.algorithm,
                         aug_resize=self.cfg.resize if cc else None,
                         center_crop=cc)

    def _frozen_token(self, ds: str):
        """Freeze-window mask (fedavgserver.py:422-429, 493-498): scope-'all'
        params of ``freeze_modality`` clients are frozen for rounds in
        (warmup, warmup+freeze].  The reference compares ``client.modality``
        — the per-dataset --modalities FLAG (ct/mic/pat/der for MedMNIST,
        identical to the task modality everywhere else), the same value
        warmup sampling filters on (sampling.py:65-66)."""
        c = self.cfg
        if c.freeze_modality == "none":
            return None
        flag = next((m for i, m in enumerate(self.client_modality_of)
                     if self.client_dataset_of[i] == ds), None)
        if flag != c.freeze_modality:
            return None
        in_window = (self.round <= c.freeze_rounds + c.warmup_rounds
                     and self.round > c.warmup_rounds)
        if not in_window:
            return None
        mcfg = self.model_cfgs[ds]
        frozen = tuple(sorted({path for path, name in naming.param_names(mcfg)
                               if self.param_scope.get(name) == "all"}))
        return frozen or None

    # ------------------------------------------------------------- training --

    def _pad_to_mesh(self, n: int) -> int:
        """Stacked client axes must divide the mesh's client axis."""
        return self.mesh_plan.pad_clients(n)

    def _stage_resident(self, cache_key: str, dset, spec) -> Optional[Dict]:
        """Stage one dataset's arrays into HBM once (replicated over the
        mesh) for the on-device-gather data plane; returns None when the
        dataset doesn't qualify (truly lazy-decoded images or over the byte
        budget).  The host link is the slowest wire in the system (PCIe at
        best, a network tunnel at worst), so shipping the dataset once and
        gathering per-step batches on device replaces gigabytes of
        per-round pixel traffic with kilobyte index maps.

        Path-backed datasets (COCO/Flickr — the flagship scripts' data,
        reference hot path fedavgclient.py:44-53 per-sample DataLoader
        decode) materialize into a deduped unique-image store + row map
        (datasets.py:103-129); both are staged and the per-step gather adds
        one indirection ``store[row[idx]]`` — 5x smaller than per-caption
        rows, since retrieval sets repeat each image for its 5 captions."""
        if cache_key in self._resident_cache:
            return self._resident_cache[cache_key]
        arrays = {}
        if "img" in spec.modality:
            if dset.images is not None:
                arrays["img"] = dset.images
            elif dset._image_store is not None:
                arrays["img_store"] = dset._image_store
                arrays["img_row"] = np.asarray(dset._image_row, np.int32)
            else:
                self._resident_cache[cache_key] = None  # lazy decode
                return None
        if "txt" in spec.modality:
            arrays["txt"] = np.asarray(dset.texts, np.int32)
        if spec.modality != "img+txt":
            arrays["tgt"] = np.asarray(dset.targets, np.int32)
        total = sum(a.nbytes for a in arrays.values())
        if total > self.resident_budget_left():
            logger.info("[DATA] %s stays host-fed (%.2f GB > %.2f GB "
                        "remaining of the resident budget)", cache_key,
                        total / 1e9, self.resident_budget_left() / 1e9)
            self._resident_cache[cache_key] = None
            return None
        dev = {k: self.mesh_plan.replicate(jnp.asarray(v))
               for k, v in arrays.items()}
        jax.block_until_ready(dev)
        logger.info("[DATA] %s staged HBM-resident (%.1f MB); per-round "
                    "host traffic is now index maps only", cache_key,
                    total / 1e6)
        self._resident_cache[cache_key] = dev
        self._resident_bytes += total
        return dev

    def resident_budget_left(self) -> int:
        """Remaining HBM staging budget: ONE ledger across every consumer
        (train residents, eval residents, CreamFL pub batches), so the
        configured limit bounds total pinned device memory rather than
        each staging in isolation."""
        budget = int(os.environ.get("FEDCOLA_RESIDENT_BUDGET",
                                    6 * 1024 ** 3))
        return max(budget - self._resident_bytes, 0)

    def _resident_data(self, ds: str, spec) -> Optional[Dict]:
        """HBM-staged train arrays for a dataset's client group."""
        return self._stage_resident(ds, self._train_dataset(ds), spec)

    def _resident_eval_data(self, ds: str, spec) -> Optional[Dict]:
        """Eval twin of :meth:`_resident_data`: stage the server test set
        into HBM once so every central-eval / retrieval batch is an
        on-device index gather."""
        return self._stage_resident(f"eval:{ds}",
                                    self.data.server_eval[ds], spec)

    def _shard_clients(self, tree):
        return self.mesh_plan.shard_client_tree(tree)

    # ------------------------------------------ shared group-update pieces --
    # (used by both the FedAvg and CreamFL train paths, so a fix to any of
    # them applies to every algorithm)

    def _init_metric_acc(self, n_pad: int):
        """Per-client on-device metric accumulators: they stay ON DEVICE
        for the whole round — a host readback per chunk would cap the
        dispatch queue at one program deep; one readback per round keeps
        device execution pipelined behind the host feeder."""
        return self._shard_clients({
            "l": jnp.zeros((n_pad,), jnp.float32),
            "c": jnp.zeros((n_pad,), jnp.float32),
            "n": jnp.zeros((n_pad,), jnp.float32)})

    @staticmethod
    def _accumulate_metrics(acc, ls, cs, ns):
        nsf = ns.astype(jnp.float32)
        return {"l": acc["l"] + (ls.astype(jnp.float32) * nsf).sum(1),
                "c": acc["c"] + cs.astype(jnp.float32).sum(1),
                "n": acc["n"] + nsf.sum(1)}

    @staticmethod
    def _pad_chunk(chunk, n: int, n_pad: int):
        """Mesh-padding clients: zero rows, all steps masked off."""
        if n_pad == n:
            return chunk
        return {k: np.concatenate(
            [v, np.zeros((n_pad - n,) + v.shape[1:], v.dtype)])
            for k, v in chunk.items()}

    def _readback_group_metrics(self, acc, ds: str, ids: List[int]):
        """One readback per group per round + the numerics sanitizer (the
        reference runs under torch.autograd.set_detect_anomaly(True),
        main.py:307, which raises only on NaN in backward): a transient
        inf/NaN *loss* with still-finite params can recover, so by default
        it's a loud warning naming the offending clients; the hard failure
        is the post-aggregation global-params finiteness check in
        update() — --detect_anomaly upgrades this to an immediate error
        and enables jax_debug_nans for op-level tracing."""
        n = len(ids)
        loss_sums = self.mesh_plan.to_host(acc["l"]).astype(np.float64)[:n]
        cor = self.mesh_plan.to_host(acc["c"]).astype(np.float64)[:n]
        cnt = self.mesh_plan.to_host(acc["n"]).astype(np.float64)[:n]
        bad = ~np.isfinite(loss_sums)
        if bad.any():
            msg = (f"non-finite training loss in round {self.round} for "
                   f"dataset {ds!r}, clients "
                   f"{[ids[j] for j in np.nonzero(bad)[0]]} "
                   f"(lr={self.curr_lr:.3g}; rerun with --detect_anomaly "
                   f"for op-level NaN tracing)")
            if self.cfg.detect_anomaly:
                raise FloatingPointError(msg)
            logger.warning("%s — continuing; aggregation will abort if the "
                           "global params go non-finite", msg)
        return {cid: {"loss": float(loss_sums[j] / max(cnt[j], 1)),
                      "acc1": float(cor[j] / max(cnt[j], 1))}
                for j, cid in enumerate(ids)}

    def _record_update_summary(self, sampled, round_metrics, updated_sizes):
        """Training-loss cohort summary (reference _log_results,
        fedavgserver.py:362-379): results record + log line + writer."""
        self.results[self.round]["clients_updated"] = round_metrics
        tr_losses = [round_metrics[i]["loss"] for i in sampled]
        tr_sizes = [updated_sizes[i] for i in sampled]
        summary = self.summarize_losses(tr_losses, tr_sizes)
        self.results[self.round]["clients_updated_summary"] = \
            {"loss": summary}
        logger.info("[%s] [Round %04d] [UPDATE] [SUMMARY] (%d clients) "
                    "loss avg %.4f std %.4f | top10%% %.4f | bottom10%% "
                    "%.4f", self.cfg.algorithm.upper(), self.round,
                    len(sampled), summary["avg"], summary["std"],
                    summary["top10p_avg"], summary["bottom10p_avg"])
        if self.writer:
            self.writer.log({"Local Training Loss/Avg.": summary["avg"],
                             "Local Training Loss/Std.": summary["std"]},
                            self.round)

    def _padded_group_members(self, groups):
        """Stacked uploads may be mesh-padded; pad the member lists with a
        -1 sentinel so aggregation weight vectors match the stack
        length."""
        return {ds: ids + [-1] * (self._pad_to_mesh(len(ids)) - len(ids))
                for ds, ids in groups.items()}

    def _train_group(self, ds: str, ids: List[int]):
        """One group's batched local update; returns the stacked upload tree
        (aux already folded, leading axis possibly mesh-padded) and
        per-client average training metrics."""
        cfg, mcfg = self.cfg, self.model_cfgs[ds]
        spec = self._group_spec(ds)
        n = len(ids)
        n_pad = self._pad_to_mesh(n)
        stacked = self._shard_clients(
            _broadcast_stack(self.global_params[ds], n_pad))
        opt_state = init_group_opt_states(self.opt_spec, stacked)
        frozen = self._frozen_token(ds)

        shards = [self.data.client_shards[i] for i in ids]
        spec, aug, data_dev = self._group_aug_plan(ds, spec)
        feeder = GroupFeeder(shards, cfg.B, spec.modality,
                             chunk_steps=cfg.train_chunk_steps,
                             shuffle=not cfg.no_shuffle,
                             rng=self.shuffle_rng,
                             debug_two_batches=cfg.debug, aug=aug)
        update_fn = build_group_update(mcfg, spec, self.opt_spec, frozen,
                                       resident=data_dev is not None)
        gp = self.global_params[ds]
        acc = self._init_metric_acc(n_pad)
        chunks = feeder.round_index_chunks(cfg.E) if data_dev is not None \
            else feeder.round_chunks(cfg.E)
        for chunk in Prefetcher(chunks):
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
        upload = fold_aux_into_upload(mcfg, stacked)
        return upload, self._readback_group_metrics(acc, ds, ids)

    def _assert_global_finite(self):
        """Hard numerics guard at the one point where corruption becomes
        permanent: a non-finite aggregated global parameter poisons every
        later round and checkpoint, so abort the run.  One fused device
        reduction + a single scalar readback per dataset per round."""
        for ds, params in self.global_params.items():
            leaves = jax.tree_util.tree_leaves(params)
            ok = jnp.all(jnp.stack(
                [jnp.all(jnp.isfinite(l)) for l in leaves]))
            if not bool(ok):
                bad = [name for p, name
                       in naming.param_names(self.model_cfgs[ds])
                       if not bool(jnp.all(jnp.isfinite(
                           naming.get_by_path(params, p))))]
                raise FloatingPointError(
                    f"aggregation produced non-finite global params in "
                    f"round {self.round} for dataset {ds!r}: {bad[:8]} "
                    f"(lr={self.curr_lr:.3g}; rerun with --detect_anomaly "
                    f"for op-level NaN tracing)")

    # --------------------------------------------------------------- round ---

    def update(self) -> List[int]:
        cfg = self.cfg
        t0 = time.time()
        sampled = sample_clients(
            self.sampler, self.client_dataset_of, self.client_modality_of,
            cfg.client_datasets, self.Cs, cfg.C, cfg.equal_sampled,
            self.round, cfg.warmup_modality, cfg.warmup_rounds)
        if not sampled:
            logger.warning("round %d: no clients sampled (warmup filter)",
                           self.round)
            return []
        groups: Dict[str, List[int]] = defaultdict(list)
        for i in sampled:
            groups[self.clients[i].dataset].append(i)
        updated_sizes = {i: self.clients[i].n_train for i in sampled}

        from fedcola_tpu.utils.profiling import Timer
        timer = Timer()
        uploads, round_metrics = {}, {}
        with timer.section("train"):
            for ds, ids in groups.items():
                uploads[ds], m = self._train_group(ds, ids)
                round_metrics.update(m)
        self._record_update_summary(sampled, round_metrics, updated_sizes)

        group_members = self._padded_group_members(groups)
        client_cfgs = {ds: self.model_cfgs[ds] for ds in groups}

        def aggregate_all(fedavg: bool):
            new = {}
            for i, ds in enumerate(self.global_params.keys()):
                jobs, weights = agg.plan_aggregation(
                    ds, self.model_cfgs[ds], client_cfgs, self.clients,
                    sampled, updated_sizes, self.param_scope,
                    cfg.modalities or [DATASET_2_MODALITY[d]
                                       for d in cfg.client_datasets],
                    group_members,
                    out_modality_scale=cfg.out_modality_scales[i]
                    if i < len(cfg.out_modality_scales) else 1.0,
                    compensation=cfg.compensation,
                    share_scope=cfg.share_scope, fedavg=fedavg,
                    model_modality=DATASET_2_MODALITY[ds],
                    model_task=DATASET_2_TASK[ds])
                new[ds] = agg.apply_aggregation(
                    jobs, weights, self.global_params[ds], uploads)
            return new

        if cfg.fedavg_eval:
            # evaluate a plain-fedavg aggregate, then restore
            # (fedavgserver.py:794-806)
            old = self.global_params
            with timer.section("fedavg_eval"):
                self.global_params = aggregate_all(fedavg=True)
                self._central_evaluate(fedavg=True)
            self.global_params = old

        with timer.section("aggregate"):
            self.global_params = aggregate_all(fedavg=False)

            if cfg.with_aux:
                self.global_params = exchange_aux_weights(
                    self.global_params, self.model_cfgs,
                    {ds: DATASET_2_MODALITY[ds] for ds in self.global_params})
            # multi-process: aggregation outputs may carry sharded
            # layouts; re-replicate so the process-0-gated checkpoint /
            # finalize can serialize without a collective (no-op
            # single-process)
            self.global_params = {
                ds: self.mesh_plan.ensure_addressable(p)
                for ds, p in self.global_params.items()}
        self._assert_global_finite()

        if self.round % cfg.lr_decay_step == 0:
            self.curr_lr *= cfg.lr_decay

        dt = time.time() - t0
        self.results[self.round]["round_seconds"] = dt
        self.results[self.round]["round_sections"] = dict(timer.sections)
        logger.info("[%s] [Round %04d] %d clients in %d groups, %.2fs (%s)",
                    cfg.algorithm.upper(), self.round, len(sampled),
                    len(groups), dt, timer.summary())
        return sampled

    # ---------------------------------------------------------------- eval ---

    def _central_evaluate(self, fedavg: bool = False):
        cfg = self.cfg
        for ds, test in self.data.server_eval.items():
            mcfg = self.model_cfgs[ds]
            spec = self._group_spec(ds)
            params = self.global_params[ds]
            if DATASET_2_MODALITY[ds] == "img+txt":
                res = retrieval.evaluate(
                    mcfg, spec, params, test,
                    batch_size=cfg.eval_batch_size,
                    rng=np.random.RandomState(self.cfg.seed + self.round),
                    mesh_plan=self.mesh_plan,
                    resident=self._resident_eval_data(ds, spec))
                r1sum = 0.0
                payload = {}
                for split_key, prefix in (("n_fold", "1k"), (None, "5k")):
                    block = res["n_fold"] if split_key else res
                    for d in ("i2t", "t2i"):
                        for m, v in block[d].items():
                            payload[f"{ds} {prefix}_{d}_{m}"] = v
                    r1 = block["i2t"]["recall_1"] + block["t2i"]["recall_1"]
                    payload[f"{ds} {prefix}_r@1sum"] = r1
                    r1sum += r1
                payload[f"{ds} r@1sum"] = r1sum
                tag_mm = f"{ds}_fedavg" if fedavg else ds
                self.results[self.round][f"server_evaluated_{tag_mm}"] = payload
                logger.info("[EVAL] [%s] r@1sum=%.4f 5k_i2t_r@1=%.4f "
                            "5k_t2i_r@1=%.4f", ds, r1sum,
                            res["i2t"]["recall_1"], res["t2i"]["recall_1"])
                if self.writer:
                    self.writer.log(payload, self.round)
            else:
                resident = self._resident_eval_data(ds, spec)
                fwd = build_eval_forward(mcfg, spec,
                                         resident=resident is not None)
                mm = MetricManager(cfg.eval_metrics)
                # eval batches shard over the whole mesh (the reference's
                # equivalent DataParallel axis, fedavgclient.py:60-61)
                B = self.mesh_plan.pad_eval_batch(cfg.eval_batch_size
                                                  or cfg.B)
                params_dev = self.mesh_plan.replicate(params)
                from fedcola_tpu.ops.losses import cross_entropy
                from fedcola_tpu.utils.dispatch import DispatchWindow
                n = test.n

                # windowed dispatch-ahead: keep the device pipelined
                # behind the host without pinning every host-fed batch's
                # input buffers in HBM at once
                def drain_one(dev, idx):
                    logits = self.mesh_plan.to_host(dev)[:len(idx)]
                    y = test.targets[idx]
                    loss = float(cross_entropy(jnp.asarray(logits),
                                               jnp.asarray(y)))
                    mm.track(loss, logits, y)

                window = DispatchWindow(drain_one)
                from fedcola_tpu.utils.dispatch import pad_batch_indices
                for start in range(0, n, B):
                    idx = np.arange(start, min(start + B, n))
                    gidx = pad_batch_indices(idx, B)
                    if resident is not None:
                        batch = {"idx": gidx.astype(np.int32)}
                    else:
                        batch = {"x": (test.load_images(gidx)
                                       if "img" in DATASET_2_MODALITY[ds]
                                       else test.texts[gidx]),
                                 "y": test.targets[gidx].astype(np.int32)}
                    batch = self.mesh_plan.shard_eval_batch(batch)
                    dev = (fwd(params_dev, batch, resident)
                           if resident is not None
                           else fwd(params_dev, batch))
                    window.push(dev, idx)
                window.flush()
                mm.aggregate(n)
                result = mm.results
                # clean keys (the reference has a precedence slip here,
                # fedavgserver.py:353-355 — SURVEY.md §7 says fix, not copy)
                tag = f"{ds}_fedavg" if fedavg else ds
                self.results[self.round][f"server_evaluated_{tag}"] = result
                logger.info("[EVAL] [%s] loss=%.4f %s", ds, result["loss"],
                            " ".join(f"{k}={v:.4f}"
                                     for k, v in result["metrics"].items()))
                if self.writer:
                    self.writer.log(
                        {f"Loss/Server {tag} Loss": result["loss"],
                         **{f"Test/Server {tag} {k.title()}": v
                            for k, v in result["metrics"].items()}},
                        self.round)

    @staticmethod
    def summarize_losses(losses, num_samples):
        """Weighted avg/std + top/bottom-10% cohort stats of per-client
        losses (exact port of the summary math, fedavgserver.py:362-379)."""
        la = np.asarray(losses, float)
        ns = np.asarray(num_samples, float)
        weighted = la.dot(ns) / ns.sum()
        std = la.std()
        k = int(0.1 * len(la))
        if len(la) > 1 and k >= 1:
            top_i = np.argpartition(la, -k)[-k:]
            bot_i = np.argpartition(la, max(1, k - 1))[:max(1, k)]
        else:
            top_i = bot_i = np.arange(len(la))
        top = la[top_i]; bot = la[bot_i]
        return {
            "avg": float(weighted), "std": float(std),
            "top10p_avg": float(top.dot(ns[top_i]) / ns[top_i].sum()),
            "top10p_std": float(top.std()),
            "bottom10p_avg": float(bot.dot(ns[bot_i]) / ns[bot_i].sum()),
            "bottom10p_std": float(bot.std()),
        }

    def _local_evaluate(self, ids, participated: bool):
        """Per-client evaluation of the global models on local holdout sets.

        The reference's client-eval call is broken for MAT
        (``self.model(inputs, task=...)``, fedavgclient.py:140 — wrong
        signature; scripts run eval_type=global).  This implements the
        intended semantics: each client evaluates its downloaded global
        model on its local test split; per-task metrics follow
        ``_create_clients`` (acc1 for cls, f1 otherwise,
        fedavgserver.py:252)."""
        from fedcola_tpu.ops.losses import clip_contrastive, cross_entropy
        from fedcola_tpu.parallel.client_update import build_local_eval
        losses, sizes = [], []
        # per-task-metric (acc1 for cls clients, f1 otherwise) cohort
        # values as (value, n_samples) pairs, summarized like the losses
        metric_vals: Dict[str, List] = defaultdict(list)
        groups: Dict[str, List[int]] = defaultdict(list)
        for i in ids:
            shard = self.data.client_shards[i]
            if shard.test_indices is None or len(shard.test_indices) == 0:
                continue
            groups[self.clients[i].dataset].append(i)

        serial: List[int] = []
        for ds, gids in groups.items():
            mcfg = self.model_cfgs[ds]
            spec = self._group_spec(ds)
            # client holdouts index into the TRAIN dataset, so the
            # HBM-resident train arrays serve local eval too
            resident = self._resident_data(ds, spec)
            task = self.clients[gids[0]].task
            if resident is None or not (task == "cls"
                                        or spec.modality == "img+txt"):
                serial.extend(gids)   # host-fed / sklearn-metric fallback
                continue
            # batched: the whole group evaluates as ONE program —
            # vmap(clients)[scan(batches)] on the resident plane with a
            # single readback (replaces the serial per-client host loop)
            B = self.mesh_plan.pad_eval_batch(self.cfg.B)
            tidxs = [self.data.client_shards[i].test_indices for i in gids]
            S = max(-(-len(t) // B) for t in tidxs)
            # bucket the step count to the next power of two so a
            # different client mix in a later eval round reuses the same
            # compiled program (same trick as GroupFeeder._bucket; padded
            # steps are exact no-ops via `valid`)
            S = 1 << (S - 1).bit_length() if S > 1 else 1
            n = len(gids)
            n_pad = self._pad_to_mesh(n)
            idx = np.zeros((n_pad, S, B), np.int32)
            val = np.zeros((n_pad, S, B), bool)
            for c, t in enumerate(tidxs):
                for s in range(-(-len(t) // B)):
                    sel = t[s * B:(s + 1) * B]
                    idx[c, s, :len(sel)] = sel
                    if 0 < len(sel) < B:
                        idx[c, s, len(sel):] = sel[0]
                    val[c, s, :len(sel)] = True
            fn = build_local_eval(mcfg, spec)
            arrs = self._shard_clients({"idx": idx, "valid": val})
            params_dev = self.mesh_plan.replicate(self.global_params[ds])
            ls, cs, ns = fn(params_dev, arrs["idx"], arrs["valid"], resident)
            ls, cs, ns = (self.mesh_plan.to_host(a).astype(np.float64)[:n]
                          for a in (ls, cs, ns))
            for j, i in enumerate(gids):
                losses.append(float(ls[j] / max(ns[j], 1.0)))
                sizes.append(len(tidxs[j]))
                if spec.modality != "img+txt":
                    metric_vals["acc1"].append(
                        (float(cs[j] / max(ns[j], 1.0)), len(tidxs[j])))

        # one replicated parameter staging per dataset (not per client)
        params_dev_of: Dict[str, object] = {}
        for i in serial:
            shard = self.data.client_shards[i]
            ds = self.clients[i].dataset
            mcfg = self.model_cfgs[ds]
            spec = self._group_spec(ds)
            resident = self._resident_data(ds, spec)
            fwd = build_eval_forward(mcfg, spec,
                                     resident=resident is not None)
            if ds not in params_dev_of:
                params_dev_of[ds] = self.mesh_plan.replicate(
                    self.global_params[ds])
            params_dev = params_dev_of[ds]
            metrics = ["acc1"] if self.clients[i].task == "cls" else ["f1"]
            mm = MetricManager(metrics if spec.modality != "img+txt" else [])
            B = self.mesh_plan.pad_eval_batch(self.cfg.B)
            tidx = shard.test_indices
            # windowed dispatch-ahead (same pipelining/backpressure
            # trade-off as central eval)
            from fedcola_tpu.utils.dispatch import DispatchWindow

            def drain_one(dev, sel):
                if spec.modality == "img+txt":
                    fi, ft = dev
                    loss = float(clip_contrastive(fi[:len(sel)],
                                                  ft[:len(sel)]))
                    mm.track(loss, count=len(sel))
                else:
                    logits = self.mesh_plan.to_host(dev)[:len(sel)]
                    y = shard.dataset.targets[sel]
                    loss = float(cross_entropy(jnp.asarray(logits),
                                               jnp.asarray(y)))
                    mm.track(loss, logits, y)

            window = DispatchWindow(drain_one)
            from fedcola_tpu.utils.dispatch import pad_batch_indices
            for s in range(0, len(tidx), B):
                sel = tidx[s:s + B]
                gsel = pad_batch_indices(sel, B)
                d = shard.dataset
                if resident is not None:
                    batch = {"idx": gsel.astype(np.int32)}
                elif spec.modality == "img+txt":
                    batch = {"x": d.load_images(gsel), "y": d.texts[gsel]}
                else:
                    batch = {"x": (d.load_images(gsel)
                                   if spec.modality == "img"
                                   else d.texts[gsel]),
                             "y": d.targets[gsel].astype(np.int32)}
                batch = self.mesh_plan.shard_eval_batch(batch)
                dev = (fwd(params_dev, batch, resident)
                       if resident is not None else fwd(params_dev, batch))
                window.push(dev, sel)
            window.flush()
            mm.aggregate(len(tidx))
            losses.append(mm.results["loss"])
            sizes.append(len(tidx))
            for m, v in mm.results.get("metrics", {}).items():
                metric_vals[m].append((float(v), len(tidx)))
        if not losses:
            return
        summary = {"loss": self.summarize_losses(losses, sizes)}
        for m, pairs in metric_vals.items():
            summary[m] = self.summarize_losses([p[0] for p in pairs],
                                               [p[1] for p in pairs])
        key = f'clients_evaluated_{"in" if participated else "out"}'
        self.results[self.round][key] = summary
        logger.info("[EVAL] [LOCAL] %d clients | loss avg %.4f std %.4f "
                    "top10%% %.4f bot10%% %.4f", len(losses),
                    summary["loss"]["avg"], summary["loss"]["std"],
                    summary["loss"]["top10p_avg"],
                    summary["loss"]["bottom10p_avg"])
        if self.writer:
            tag = "In" if participated else "Out"
            self.writer.log({f"Local Test Loss ({tag})/Avg.":
                             summary["loss"]["avg"],
                             f"Local Test Loss ({tag})/Std.":
                             summary["loss"]["std"]}, self.round)

    def evaluate(self, excluded_ids=()):
        if self.cfg.eval_type != "global" and not getattr(
                self.cfg, "train_only", False):
            ids = sample_clients(
                self.sampler, self.client_dataset_of,
                self.client_modality_of, self.cfg.client_datasets, self.Cs,
                self.cfg.C, self.cfg.equal_sampled, self.round,
                exclude=list(excluded_ids),
                eval_fraction=self.cfg.eval_fraction, eval_mode=True)
            # the eval pool consists of UNparticipated clients (when
            # excluded_ids lists the round's participants) or the general
            # population — either way it is the reference's
            # participated=False cohort (`clients_evaluated_out`,
            # fedavgserver.py:866 always passes participated=False; the
            # 'in' record only exists in its dormant generalization-gap
            # machinery, :871-880)
            self._local_evaluate(ids, participated=False)
        if self.cfg.eval_type != "local":
            self._central_evaluate()

    # ------------------------------------------------------------- finalize --

    def save_checkpoint(self, path: str):
        os.makedirs(path, exist_ok=True)
        for ds, params in self.global_params.items():
            flat = {}
            for p, name in naming.param_names(self.model_cfgs[ds]):
                flat[name] = np.asarray(naming.get_by_path(params, p))
            np.savez(os.path.join(path, f"{ds}.npz"),
                     __round__=self.round, __lr__=self.curr_lr, **flat)
        # host RNG streams: client sampling is stateless (keyed by
        # seed+round), but the feeder shuffle stream and the jax key are
        # consumed per round — persist them so a resumed run reproduces
        # an uninterrupted one exactly
        st = self.shuffle_rng.get_state()
        np.savez(os.path.join(path, "__rng__.npz"),
                 mt_keys=st[1], mt_pos=st[2], mt_has_gauss=st[3],
                 mt_cached=st[4], jax_key=np.asarray(self.key))

    def load_checkpoint(self, path: str):
        for ds in self.global_params:
            f = os.path.join(path, f"{ds}.npz")
            if not os.path.exists(f):
                continue
            z = np.load(f)
            params = self.global_params[ds]
            for p, name in naming.param_names(self.model_cfgs[ds]):
                if name in z:
                    naming.set_by_path(params, p, jnp.asarray(z[name]))
            self.round = int(z["__round__"])
            self.curr_lr = float(z["__lr__"])
        rngf = os.path.join(path, "__rng__.npz")
        if os.path.exists(rngf):
            z = np.load(rngf)
            self.shuffle_rng.set_state(
                ("MT19937", z["mt_keys"], int(z["mt_pos"]),
                 int(z["mt_has_gauss"]), float(z["mt_cached"])))
            self.key = jnp.asarray(z["jax_key"])

    def finalize(self):
        cfg = self.cfg
        os.makedirs(cfg.result_path, exist_ok=True)
        with open(os.path.join(cfg.result_path, f"{cfg.exp_name}.json"),
                  "w", encoding="utf8") as f:
            from fedcola_tpu.utils.logging import json_sanitize
            json.dump(json_sanitize({str(k): v
                                     for k, v in self.results.items()}), f,
                      indent=4, default=float)
        ckpt_dir = os.path.join(cfg.result_path, cfg.exp_name)
        self.save_checkpoint(ckpt_dir)
        # reference-format final checkpoints: per-dataset .pt state_dicts
        # under the exact reference parameter names/layouts
        # (fedavgserver.py:884-898), loadable with strict=True by the
        # reference's ModalityAgnosticTransformer
        try:
            import torch
            from fedcola_tpu.models.torch_io import to_torch_state_dict
            for ds, params in self.global_params.items():
                # np.array copies: jax buffers are read-only and torch
                # warns on (and forbids writing to) non-writable tensors
                sd = {k: torch.from_numpy(np.array(v))
                      for k, v in to_torch_state_dict(
                          self.model_cfgs[ds], params).items()}
                torch.save(sd, os.path.join(ckpt_dir, f"{ds}.pt"))
        except ImportError:
            logger.warning("torch unavailable; skipped .pt checkpoints")
        if self.writer:
            self.writer.finish()
        logger.info("[%s] finished federated learning (%d rounds)",
                    cfg.algorithm.upper(), self.round)


class FedProxServer(FedAvgServer):
    """Trivial subclass: the proximal term lives in the client loss
    (reference fedproxserver.py:10-12)."""


class FedIoTServer(FedAvgServer):
    """Config alias documented in README.md:70: shared_param=blocks,
    share_scope=modality_exact on fedavg machinery (the reference's fediot
    modules are missing — scripts would ImportError; SURVEY.md §7)."""


SERVER_REGISTRY = {
    "fedavg": FedAvgServer,
    "fedprox": FedProxServer,
    "fediot": FedIoTServer,
    "fedsgd": FedAvgServer,
}


def create_server(cfg: ExperimentConfig, data: FederatedData, writer=None):
    if cfg.algorithm in SERVER_REGISTRY:
        return SERVER_REGISTRY[cfg.algorithm](cfg, data, writer)
    if cfg.algorithm == "creamfl":
        from fedcola_tpu.federation.creamfl import CreamflServer
        return CreamflServer(cfg, data, writer)
    if cfg.algorithm in ("fedavgm", "fedadam", "fedyogi", "fedadagrad"):
        from fedcola_tpu.federation.fedopt import FedOptServer
        return FedOptServer(cfg, data, writer)
    raise ValueError(f"unknown algorithm {cfg.algorithm!r}")
