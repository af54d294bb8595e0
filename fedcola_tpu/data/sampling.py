"""Per-round client sampling (reference ``_sample_clients``,
fedavgserver.py:282-312).

* ``equal_sampled``: per client-dataset, ``sorted(sample(ids, max(int(C_d *
  len(ids)), 1)))`` then globally sorted;
* global: ``sorted(sample(range(K), max(int(C*K), 1)))``;
* eval sampling over unparticipated clients with ``eval_fraction``;
* warmup filtering: in rounds <= warmup_rounds, keep only
  ``warmup_modality`` clients (fedavgserver.py:307-308).

Randomness is STATELESS: each call derives its ``random.Random`` from
``(seed, round_idx, eval_mode)`` (the reference uses the globally seeded
``random`` module, whose stream depends on everything drawn before it).
A resumed run therefore samples the same cohorts as an uninterrupted one,
and eval-round draws cannot perturb the training-round stream.  The key
is an integer mix (3.12's ``Random`` accepts int/str/bytes seeds only),
stable across processes.
"""

from __future__ import annotations

import random
from typing import Dict, List, Sequence


def sample_clients(seed: int,
                   client_dataset_of: Sequence[str],
                   client_modality_of: Sequence[str],
                   datasets: Sequence[str],
                   Cs: Dict[str, float],
                   C: float,
                   equal_sampled: bool,
                   round_idx: int,
                   warmup_modality: str = "none",
                   warmup_rounds: int = 5,
                   exclude: Sequence[int] = (),
                   eval_fraction: float = 1.0,
                   eval_mode: bool = False) -> List[int]:
    K = len(client_dataset_of)
    rng = random.Random(int(seed) * 1_000_003 + int(round_idx) * 2
                        + (1 if eval_mode else 0))
    if equal_sampled and not eval_mode:
        sampled: List[int] = []
        for dataset in datasets:
            ids = [i for i in range(K) if client_dataset_of[i] == dataset]
            if not ids:
                continue
            n = max(int(Cs[dataset] * len(ids)), 1)
            sampled += sorted(rng.sample(ids, n))
        sampled = sorted(sampled)
    elif not eval_mode:
        n = max(int(C * K), 1)
        sampled = sorted(rng.sample(range(K), n))
    else:
        # evaluation sampling over unparticipated clients
        # (fedavgserver.py:296-305)
        n_un = K - len(exclude)
        if n_un == 0:
            return sorted(range(K))
        n = max(int(eval_fraction * n_un), 1)
        excluded = set(exclude)
        pool = [i for i in range(K) if i not in excluded]
        return sorted(rng.sample(pool, n))

    if warmup_modality != "none" and round_idx <= warmup_rounds:
        sampled = [i for i in sampled
                   if client_modality_of[i] == warmup_modality]
    return sampled
