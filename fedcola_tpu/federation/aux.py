"""FedCola aux weight flows: upload fold-in and server cross-modal exchange.

* Fold-in (reference ``FedavgClient.upload``, fedavgclient.py:158-184):
  uni-modal ``with_aux`` clients upload ``W <- W + cross_modal_scale *
  W_aux`` for each reparameterised layer and strip aux keys.  Here that is a
  pytree transform over the stacked trained group parameters — vmap-free
  since the leading client axis broadcasts.

* Exchange (reference fedavgserver.py:821-845): after aggregation the server
  copies the *other modality's* aggregated block weights into each uni-modal
  global model's aux slots (img model's aux <- txt model's blockses.1
  kernels and vice versa), remapping the slot index.  ``cross_modal_scale``
  is NOT exchanged or aggregated (``aux_params`` only matches 'aux' keys,
  mome.py:862-878; ``required_params`` strips scales, mome.py:844-860), so
  every round clients restart the scale from the zero-initialised global
  value.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from fedcola_tpu.models.mat import MATConfig, Params, fold_aux_kernels


def fold_aux_into_upload(cfg: MATConfig, params: Params) -> Params:
    """W + scale*W_aux fold for uni-modal with_aux clients; returns a tree
    without the aux collection.  Works on single or stacked ([n, ...])
    parameter trees (scale broadcast handles both)."""
    if not cfg.has_aux or "aux" not in params:
        return {k: v for k, v in params.items() if k != "aux"}
    main = str(cfg.main_slot)
    blk = fold_aux_kernels(cfg, params["blk"][main], params["aux"])
    out = {k: v for k, v in params.items() if k != "aux"}
    out["blk"] = dict(params["blk"])
    out["blk"][main] = blk
    return out


def exchange_aux_weights(global_params: Dict[str, Params],
                         global_cfgs: Dict[str, MATConfig],
                         modality_of: Dict[str, str]) -> Dict[str, Params]:
    """Server-side aux exchange after aggregation (fedavgserver.py:821-845).
    For each uni-modal global model, source the aux kernels from the FIRST
    dataset of the other modality (the reference indexes ``[0]``)."""
    datasets = list(global_params.keys())
    first_of = {}
    for ds in datasets:
        m = modality_of[ds]
        if m not in first_of:
            first_of[m] = ds

    new = dict(global_params)
    for ds in datasets:
        cfg = global_cfgs[ds]
        m = modality_of[ds]
        if m == "img+txt" or not cfg.has_aux:
            continue
        other = "txt" if m == "img" else "img"
        if other not in first_of:
            continue
        src = global_params[first_of[other]]
        src_cfg = global_cfgs[first_of[other]]
        src_blk = src["blk"][str(src_cfg.main_slot)]
        aux = dict(new[ds].get("aux", {}))
        for kind in cfg.aux_layer_kinds:
            aux[f"{kind}_aux"] = src_blk[f"{kind}_kernel"]
            # scales untouched (stay zero-initialised)
        model = dict(new[ds])
        model["aux"] = aux
        new[ds] = model
    return new
