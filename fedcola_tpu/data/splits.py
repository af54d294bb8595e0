"""Client split simulation (reference ``src/loaders/split.py:10-229``).

Produces ``{client_index: np.ndarray of sample indices}`` for the four
active scenarios:

* ``iid`` — shuffled ``array_split`` (split.py:21-30);
* ``unbalanced`` — equal split then a random 1-5%% drop per client
  (split.py:58-74); retrieval datasets (Flickr30k/Coco) route here for any
  non-iid ``split_type`` and keep caption groups of 5 together
  (split.py:33-56);
* ``patho`` — McMahan shard split with ``mincls`` shards/client
  (split.py:77-133);
* ``diri`` — Dirichlet(alpha) per class with a min-size-10 retry loop and
  the size-balancing mask (split.py:135-166).

All randomness flows through a caller-provided ``numpy.random.RandomState``
(the reference uses the globally seeded legacy numpy RNG).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def simulate_split(split_type: str, n_samples: int, K: int,
                   rng: np.random.RandomState,
                   targets: Optional[np.ndarray] = None,
                   num_classes: Optional[int] = None,
                   mincls: int = 2,
                   cncntrtn: float = 0.1,
                   caption_grouped: bool = False) -> Dict[int, np.ndarray]:
    if split_type == "iid":
        shuffled = rng.permutation(n_samples)
        parts = np.array_split(shuffled, K)
        return {k: parts[k] for k in range(K)}

    if split_type == "unbalanced" or (caption_grouped and split_type != "iid"):
        if caption_grouped:
            # keep the 5-captions-per-image invariant, exactly as the
            # reference: permutation(n//5) and rows idx*5+0..4
            # (split.py:35-56) — the n%5 tail rows (if any) belong to no
            # client and row i is assumed to caption image i//5; the
            # loaders preserve that layout (fetch_flickr30k never drops
            # a CSV row for this reason)
            shuffled = rng.permutation(n_samples // 5)
            parts = np.array_split(shuffled, K)
            keep = rng.uniform(low=0.95, high=0.99, size=len(parts))
            parts = [p[: int(len(p) * r)] for p, r in zip(parts, keep)]
            out = {}
            for k, p in enumerate(parts):
                idx = (p[:, None] * 5 + np.arange(5)[None, :]).reshape(-1)
                out[k] = idx.astype(np.int64)
            return out
        shuffled = rng.permutation(n_samples)
        parts = np.array_split(shuffled, K)
        keep = rng.uniform(low=0.95, high=0.99, size=len(parts))
        return {k: p[: int(len(p) * r)] for k, (p, r)
                in enumerate(zip(parts, keep))}

    if split_type == "patho":
        assert mincls >= 2, "each client needs >=2 distinct classes"
        assert targets is not None and num_classes is not None
        _, inverse, counts = np.unique(np.asarray(targets),
                                       return_inverse=True, return_counts=True)
        class_indices = np.split(np.argsort(inverse), np.cumsum(counts[:-1]))
        num_shards_per_class = K * mincls // num_classes
        if num_shards_per_class < 1:
            raise ValueError("increase mincls or K for patho split")
        if num_classes * num_shards_per_class < K * mincls:
            # the reference crashes mid-assignment here (NaN selection
            # probabilities once every class is exhausted,
            # split.py:110-117); fail up-front with the actual constraint
            raise ValueError(
                f"patho split infeasible: K*mincls ({K}*{mincls}) picks "
                f"but only num_classes*(K*mincls//num_classes) = "
                f"{num_classes * num_shards_per_class} shards exist; "
                "choose K*mincls divisible by num_classes")
        split_indices = [list(np.array_split(rng.permutation(ci),
                                             num_shards_per_class))
                         for ci in class_indices]
        shard_counts = {c: len(s) for c, s in enumerate(split_indices)}
        assigned = []
        for _ in range(K):
            prob = np.where(np.array(list(shard_counts.values())) > 0, 1.0, 0.0)
            prob /= prob.sum()
            try:
                chosen = rng.choice(num_classes, mincls, replace=False, p=prob)
            except ValueError:
                chosen = rng.choice(num_classes, mincls, replace=True, p=prob)
            shards = []
            for cls_idx in chosen:
                if not split_indices[cls_idx]:
                    # replace=True drew the same 1-shard class twice;
                    # the reference crashes here (choice over an empty
                    # list) — redirect to any class with shards left
                    cls_idx = max(shard_counts, key=shard_counts.get)
                pick = rng.choice(len(split_indices[cls_idx]), 1)[0]
                shards.append(split_indices[cls_idx].pop(pick))
                shard_counts[cls_idx] -= 1
            assigned.append(np.concatenate(shards))
        return {k: assigned[k] for k in range(K)}

    if split_type == "diri":
        assert targets is not None and num_classes is not None
        y = np.asarray(targets)
        N = len(y)
        min_size = 0
        while min_size < 10:
            idx_batch = [[] for _ in range(K)]
            for c in range(num_classes):
                idx_c = np.where(y == c)[0]
                rng.shuffle(idx_c)
                proportions = rng.dirichlet(np.repeat(cncntrtn, K))
                # balance: zero out clients already over the mean size
                proportions = np.array(
                    [p * (len(b) < N / K) for p, b in zip(proportions, idx_batch)])
                proportions = proportions / proportions.sum()
                cuts = (np.cumsum(proportions) * len(idx_c)).astype(int)[:-1]
                idx_batch = [b + part.tolist() for b, part
                             in zip(idx_batch, np.split(idx_c, cuts))]
                min_size = min(len(b) for b in idx_batch)
        out = {}
        for k in range(K):
            arr = np.array(idx_batch[k])
            rng.shuffle(arr)
            out[k] = arr
        return out

    raise ValueError(f"unsupported split_type {split_type!r}")
