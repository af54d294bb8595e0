"""Federated data assembly (reference ``load_datasets``/``load_dataset``,
src/loaders/data.py:52-424).

For every client-side dataset (all but the last ``--datasets`` entry,
fedavgserver.py:145): fetch train + test, simulate the client split
(caption-grouped for retrieval), and build per-client shards.  The per-
dataset *test* splits form the server's central-evaluation suite
(``raw_tests``, data.py:400-404 -> fedavgserver.py:171-173).

``test_size == -1`` (the scripts' setting) assigns the pre-defined test
split as the global holdout and gives clients their full subset
(data.py:137-156).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np

from fedcola_tpu.config import (DATASET_2_MODALITY, DATASET_2_TASK,
                                ExperimentConfig, NUM_CLASS)
from fedcola_tpu.data.datasets import TaskDataset, fetch_dataset
from fedcola_tpu.data.pipeline import ClientShard
from fedcola_tpu.data.splits import simulate_split
from fedcola_tpu.data.tokenizer import get_tokenizer
from fedcola_tpu.federation.aggregate import ClientMeta

logger = logging.getLogger(__name__)


@dataclass
class FederatedData:
    client_shards: List[ClientShard] = field(default_factory=list)
    client_meta: Dict[int, ClientMeta] = field(default_factory=dict)
    server_eval: Dict[str, TaskDataset] = field(default_factory=dict)
    tokenizers: Dict[str, object] = field(default_factory=dict)

    @property
    def K(self) -> int:
        return len(self.client_shards)


def load_federated_data(cfg: ExperimentConfig,
                        split_rng: np.random.RandomState) -> FederatedData:
    out = FederatedData()
    datasets = cfg.client_datasets
    data_paths = cfg.data_paths or [cfg.data_path] * len(datasets)
    Ks = cfg.Ks if len(cfg.Ks) == len(datasets) else \
        [cfg.Ks[0]] * len(datasets)

    cid = 0
    for i, ds in enumerate(datasets):
        root = data_paths[i] if i < len(data_paths) else cfg.data_path
        modality = DATASET_2_MODALITY[ds]
        # the reference threads the per-dataset --modalities entry as
        # args.modality into every fetch (data.py:400, :295) and the fetched
        # dataset keeps it (medmnist.py:47) — so a MedMNIST client's
        # modality is its flag (ct/img/mic/pat/der), which selects the
        # medmnist subset AND is what warmup/freeze filters and
        # modality-scope aggregation compare against
        client_modality = (cfg.modalities[i] if i < len(cfg.modalities)
                           else modality)
        task = DATASET_2_TASK[ds]
        tok = None
        if "txt" in modality:
            tok = get_tokenizer(data_path=root, dataset=ds,
                                vocab_size=cfg.vocab_size)
            out.tokenizers[ds] = tok
        kw = dict(tokenizer=tok, seq_len=cfg.seq_len,
                  synthetic=cfg.synthetic_data,
                  reduce_samples=cfg.reduce_samples,
                  reduce_samples_cls_scale=cfg.reduce_samples_cls_scale,
                  reduce_test_samples=cfg.reduce_test_samples,
                  train_all=cfg.flickr_train_all,
                  image_size=cfg.resize,
                  num_embeddings=cfg.num_embeddings,
                  use_bert_tokenizer=cfg.use_bert_tokenizer,
                  modality_flag=client_modality)
        try:
            train = fetch_dataset(ds, root, True, **kw)
            test = fetch_dataset(ds, root, False, **kw)
        except (FileNotFoundError, OSError) as e:
            logger.warning("=== SYNTHETIC DATA === dataset %s files missing "
                           "under %s (%s); training AND evaluation use a "
                           "random stand-in — metrics are meaningless for "
                           "accuracy comparisons", ds, root, e)
            kw["synthetic"] = True
            train = fetch_dataset(ds, root, True, **kw)
            test = fetch_dataset(ds, root, False, **kw)
        for d in (train, test):
            if d.image_paths is not None:
                done = d.materialize_images()
                logger.info("[LOAD] %s images %s", d.name,
                            "materialized in RAM" if done
                            else "decoded lazily (over RAM budget)")
        if ds not in out.server_eval:
            out.server_eval[ds] = test

        K_d = int(Ks[i])
        split = simulate_split(
            cfg.split_type, train.n, K_d, split_rng,
            targets=train.targets if task == "cls" else None,
            num_classes=NUM_CLASS[ds], mincls=cfg.mincls,
            cncntrtn=cfg.cncntrtn,
            caption_grouped=(ds in ("Flickr30k", "Coco")))
        for k in range(K_d):
            idx = np.asarray(split[k], np.int64)
            test_idx = None
            if cfg.test_size > 0:
                # stratified per-client holdout (reference stratified_split,
                # src/utils.py:168-179; random split for retrieval where
                # num_classes is None, data.py:146-149)
                if task == "cls" and train.targets is not None:
                    tr_parts, te_parts = [], []
                    for c in np.unique(train.targets[idx]):
                        cls_idx = split_rng.permutation(
                            idx[train.targets[idx] == c])
                        # round(), not int(): stratified_split sizes the
                        # per-class holdout with Python round
                        # (src/utils.py:175), vs the retrieval branch's
                        # int() truncation below (data.py:147)
                        n_te = round(len(cls_idx) * cfg.test_size)
                        te_parts.append(cls_idx[:n_te])
                        tr_parts.append(cls_idx[n_te:])
                    test_idx = np.concatenate(te_parts)
                    idx = np.concatenate(tr_parts)
                else:
                    n_te = int(len(idx) * cfg.test_size)
                    perm = split_rng.permutation(idx)
                    test_idx, idx = perm[:n_te], perm[n_te:]
            out.client_shards.append(ClientShard(dataset=train, indices=idx,
                                                 test_indices=test_idx))
            out.client_meta[cid] = ClientMeta(
                id=cid, dataset=ds, modality=client_modality, task=task,
                n_train=len(idx))
            cid += 1
        logger.info("[LOAD] %s: %d train / %d test -> %d clients",
                    ds, train.n, test.n, K_d)
    return out
