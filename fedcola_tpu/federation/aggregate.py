"""Server aggregation as a fused on-device weighted reduction.

The reference's aggregation kernel (``FedavgServer._aggregate``,
fedavgserver.py:591-668) is, per global model and per parameter name, a
*sequential streaming* update over the sorted sampled-client ids::

    final = global_param
    for i in sorted(ids):                       # fedavgserver.py:657
        if coef[i] == 0 or name not in upload_i: continue
        final = final + (upload_i[name] - final) * coef[i]

Because coefficient sums can differ from 1 (modality filtering, FedCola
compensation), the result depends on the residual global weight.  The closed
form over the contributing subsequence [(i1,c1) .. (im,cm)] is::

    final = g * prod_j (1-c_j)  +  sum_j  c_j * prod_{k>j} (1-c_k) * w_j

so the whole round's aggregation collapses to one weighted reduction per
parameter with **host-precomputed effective weights** — on device it is a
handful of ``tensordot``s over stacked client-parameter pytrees (the direct
output of the vmapped client-update programs), with zero host transfers.

Coefficient semantics replicated exactly, including:
* scope filters ``all | dataset | task | modality | modality_exact``
  (fedavgserver.py:624-633) — ``modality`` uses substring overlap so ``img``
  clients mix into ``img+txt`` params and vice versa;
* ``--out_modality_scales`` rescaling with its running ``old_sum`` update
  (fedavgserver.py:634-638);
* ``--compensation`` denominators per share_scope (fedavgserver.py:640-651),
  including the reference's loop-variable leak in the ``modality_exact``
  branch where the second disjunct reads the *last* iterated client
  (``self.clients[identifier]``, fedavgserver.py:648) — we evaluate it
  against the last sorted sampled id;
* "skip but count": clients whose coefficient is nonzero but whose upload
  lacks the parameter leave their mass as residual global weight
  (fedavgserver.py:660-663);
* the plain-fedavg variant used by ``--fedavg_eval`` and CreamFL's uni-modal
  models (fedavgserver.py:599-616).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fedcola_tpu.models.mat import MATConfig
from fedcola_tpu.models import naming


@dataclass(frozen=True)
class ClientMeta:
    """A client is data, not an object (contrast BaseClient,
    src/client/baseclient.py:5-50)."""
    id: int
    dataset: str
    modality: str
    task: str
    n_train: int


# ------------------------------------------------------------ coefficients --

def _scope_numerator(scope: str, client: ClientMeta, size: float,
                     model_dataset: str, model_modality: str, model_task: str,
                     param_modality: Optional[str]) -> float:
    if scope == "all":
        return size
    if scope == "dataset":
        return size if client.dataset == model_dataset else 0.0
    if scope == "task":
        return size if client.task == model_task else 0.0
    if scope == "modality":
        return size if (client.modality in model_modality
                        or model_modality in client.modality) else 0.0
    if scope == "modality_exact":
        return size if (client.modality == param_modality
                        or (param_modality is not None
                            and param_modality in client.modality)) else 0.0
    raise ValueError(f"unknown scope {scope!r}")


def compute_coefficients(
    model_dataset: str,
    model_modality: str,
    model_task: str,
    required_names: Sequence[str],
    param_scope: Dict[str, str],
    clients: Dict[int, ClientMeta],
    sorted_ids: Sequence[int],
    updated_sizes: Dict[int, int],
    experiment_modalities: Sequence[str],
    out_modality_scale: float = 1.0,
    compensation: bool = False,
    share_scope: str = "dataset",
    fedavg: bool = False,
    creamfl: bool = False,
) -> Dict[str, Dict[int, float]]:
    """Per-parameter-name, per-client mixing coefficients
    (fedavgserver.py:599-653; ``creamfl=True`` follows CreamFL's variant,
    creamflserver.py:259-279: exact-equality 'modality' scope, no
    modality_exact / out-modality scaling, compensation divides by the
    unfiltered total)."""
    coefficients: Dict[str, Dict[int, float]] = {}
    # loop-variable leak (fedavgserver.py:648): `identifier` holds the last
    # iterated updated_sizes key after each name's inner loop.  In the
    # reference that dict is built from a ChainMap over thread results, so
    # *which* client leaks is iteration-order-dependent (thread completion
    # order) and not reproducible; we pin the leak deterministically to the
    # largest sampled id.  Exact bit-parity with a given reference run on the
    # compensation+share_scope=modality_exact path is therefore approximate
    # by construction — the reference itself is not self-reproducible here.
    leak_id = sorted_ids[-1] if sorted_ids else None

    for name in required_names:
        scope = param_scope[name]
        param_modality = naming.get_name_modality(name, experiment_modalities)
        new_num: Dict[int, float] = {}
        old_sum = float(sum(updated_sizes.values()))
        for cid in sorted_ids:
            c = clients[cid]
            size = float(updated_sizes[cid])
            if fedavg or creamfl:
                # plain-fedavg branch (fedavgserver.py:602-614) and the
                # CreamFL variant (creamflserver.py:264-275) compute the
                # same numerators: 'modality' is exact equality, no
                # out-modality scaling, and 'modality_exact' is unhandled
                # (the reference would KeyError at accumulate time; we
                # yield zero contribution instead of crashing).  They
                # differ only in normalisation, handled below.
                if scope == "modality":
                    n = size if c.modality == model_modality else 0.0
                elif scope == "modality_exact":
                    n = 0.0
                else:
                    n = _scope_numerator(scope, c, size, model_dataset,
                                         model_modality, model_task,
                                         param_modality)
                new_num[cid] = n
                continue
            n = _scope_numerator(scope, c, size, model_dataset, model_modality,
                                 model_task, param_modality)
            # out-of-modality rescaling (fedavgserver.py:634-638)
            if c.modality != model_modality and out_modality_scale != 1:
                old_sum -= n
                n *= out_modality_scale
                old_sum += n
            new_num[cid] = n

        if creamfl:
            # creamflserver.py:276-279: compensation divides by the
            # unfiltered total, else by the filtered sum.  NEITHER branch
            # has a zero-denominator guard upstream (a round whose sample
            # contributes nothing to a param raises ZeroDivisionError
            # there); with the zero_init accumulation a silent 0.0
            # fallback would write ALL-ZERO global params — finite, so
            # the post-aggregation guard could not catch it — so fail as
            # loudly as the reference, with a diagnosis
            denom = old_sum if compensation else sum(new_num.values())
            if denom == 0:
                raise ZeroDivisionError(
                    f"CreamFL aggregation: no sampled client contributes "
                    f"to param {name!r} (scope {scope!r}, model "
                    f"{model_dataset!r}) — the zero-init accumulate would "
                    f"silently zero the parameter (the reference raises "
                    f"here too, creamflserver.py:276-279)")
            coefficients[name] = {cid: v / denom
                                  for cid, v in new_num.items()}
        elif fedavg or not compensation:
            denom = sum(new_num.values())
            coefficients[name] = _normalize(new_num, denom)
        else:
            if share_scope == "all":
                denom = old_sum
                coefficients[name] = _normalize(new_num, denom)
            elif share_scope == "modality":
                denom = sum(float(updated_sizes[cid]) for cid in sorted_ids
                            if clients[cid].modality in model_modality
                            or model_modality in clients[cid].modality)
                coefficients[name] = _normalize(new_num, denom)
            elif share_scope == "modality_exact":
                if param_modality:
                    denom = sum(
                        float(updated_sizes[cid]) for cid in sorted_ids
                        if clients[cid].modality == param_modality
                        or (leak_id is not None
                            and param_modality in clients[leak_id].modality))
                else:
                    denom = sum(float(updated_sizes[cid]) for cid in sorted_ids
                                if clients[cid].modality in model_modality
                                or model_modality in clients[cid].modality)
                coefficients[name] = _normalize(new_num, denom)
            else:
                # compensation with share_scope='dataset'/'task': the
                # reference's compensation branch only assigns
                # coefficients for all/modality/modality_exact
                # (fedavgserver.py:640-651); any other share_scope leaves
                # the name UNassigned, and the accumulate loop iterates
                # assigned names only (fedavgserver.py:657-668) — i.e.
                # the reference silently SKIPS every parameter and the
                # global model never changes.  Reproduce keep-global
                # (all-zero coefficients -> closed form returns g) so the
                # semantics match; check_args rejects the combination at
                # the CLI so no user run silently trains nothing.
                coefficients[name] = {cid: 0.0 for cid in new_num}
    return coefficients



def _normalize(new_num, denom):
    """Coefficient normalisation with the reference's zero-denominator
    guard (fedavgserver.py:654: ``... if sum != 0 else 0``): an all-zero
    row keeps the old global through the closed form."""
    return {cid: (v / denom if denom != 0 else 0.0)
            for cid, v in new_num.items()}

def streaming_closed_form(global_weight: float,
                          contribs: List[Tuple[int, float]]) -> Tuple[float, List[float]]:
    """Effective weights of the sequential EMA (see module docstring).

    Returns (residual weight on the old global value, per-contrib weights in
    the same order as ``contribs``)."""
    m = len(contribs)
    w = [0.0] * m
    suffix = 1.0
    for j in range(m - 1, -1, -1):
        w[j] = contribs[j][1] * suffix
        suffix *= (1.0 - contribs[j][1])
    return global_weight * suffix, w


# ------------------------------------------------------------ aggregation ---

@dataclass(frozen=True)
class AggregationJob:
    """One required-parameter-name's reduction, fully resolved to pytree
    paths.  ``contrib_groups`` maps a client-group key (dataset name) to
    (client-leaf path, index-in-stack list); weights live in a parallel
    dynamic structure so the jitted apply function is reusable."""
    target_path: Tuple[str, ...]
    name: str
    contrib_groups: Tuple[Tuple[str, Tuple[str, ...]], ...]  # (group, client_path)


def plan_aggregation(
    model_dataset: str,
    model_cfg: MATConfig,
    client_cfgs: Dict[str, MATConfig],
    clients: Dict[int, ClientMeta],
    sorted_ids: Sequence[int],
    updated_sizes: Dict[int, int],
    param_scope: Dict[str, str],
    experiment_modalities: Sequence[str],
    group_members: Dict[str, List[int]],
    out_modality_scale: float = 1.0,
    compensation: bool = False,
    share_scope: str = "dataset",
    fedavg: bool = False,
    creamfl: bool = False,
    zero_init: bool = False,
    *,
    model_modality: str,
    model_task: str,
):
    """Host-side planning: returns (jobs, weights) where ``jobs`` is a static
    tuple of AggregationJob and ``weights`` the matching dynamic structure:
    per job, (residual_scalar, {group: weight_vector[n_group]}).

    ``group_members``: per client-group (dataset), the ordered client ids of
    the stacked upload tree for this round.
    """
    required = naming.required_param_names(model_cfg)
    required_names = [n for _, n in required]
    coeffs = compute_coefficients(
        model_dataset, model_modality, model_task, required_names,
        param_scope, clients, sorted_ids, updated_sizes,
        experiment_modalities, out_modality_scale, compensation,
        share_scope, fedavg, creamfl)

    # per client-dataset: the name -> path map of its upload
    upload_maps: Dict[str, Dict[str, Tuple[str, ...]]] = {}
    for ds, ccfg in client_cfgs.items():
        upload_maps[ds] = {n: p for p, n in naming.upload_param_names(ccfg)}
    # stack position of each client in its group's upload (O(1) lookups in
    # the per-name contributor loop below)
    member_pos = {ds: {cid: i for i, cid in enumerate(members)}
                  for ds, members in group_members.items()}

    jobs: List[AggregationJob] = []
    weights: List[Tuple[float, Dict[str, np.ndarray]]] = []
    for path, name in required:
        c = coeffs[name]
        # contributing subsequence in sorted-id order
        contribs: List[Tuple[int, float]] = []
        for cid in sorted_ids:
            ds = clients[cid].dataset
            if c.get(cid, 0.0) == 0.0:
                continue
            if name not in upload_maps[ds]:
                continue  # "skip but count" (fedavgserver.py:660-663)
            contribs.append((cid, c[cid]))
        if zero_init:
            # CreamFL zero-initialises and takes a plain weighted sum
            # (creamflserver.py:256-289): weights are the raw coefficients,
            # no residual global mass
            res, w = 0.0, [cj for _, cj in contribs]
        else:
            res, w = streaming_closed_form(1.0, contribs)

        group_paths: Dict[str, Tuple[str, ...]] = {}
        group_vecs: Dict[str, np.ndarray] = {}
        for (cid, _), wj in zip(contribs, w):
            ds = clients[cid].dataset
            if ds not in group_vecs:
                group_vecs[ds] = np.zeros(len(group_members[ds]), np.float32)
                group_paths[ds] = upload_maps[ds][name]
            group_vecs[ds][member_pos[ds][cid]] += wj

        jobs.append(AggregationJob(
            target_path=path, name=name,
            contrib_groups=tuple(sorted(group_paths.items()))))
        weights.append((np.float32(res), group_vecs))
    return tuple(jobs), weights


def _tree_copy(tree):
    if isinstance(tree, dict):
        return {k: _tree_copy(v) for k, v in tree.items()}
    return tree


@functools.lru_cache(maxsize=64)
def _compiled_apply(jobs: Tuple[AggregationJob, ...], treedef_token: str):
    """Build + jit the apply function for a static job plan."""

    def apply(global_params, stacked_uploads, weight_res, weight_vecs):
        new_params = _tree_copy(global_params)
        for i, job in enumerate(jobs):
            g = naming.get_by_path(global_params, job.target_path)
            acc = weight_res[i].astype(g.dtype) * g
            for group, client_path in job.contrib_groups:
                stack = naming.get_by_path(stacked_uploads[group], client_path)
                vec = weight_vecs[i][group].astype(stack.dtype)
                acc = acc + jnp.tensordot(vec, stack, axes=(0, 0))
            naming.set_by_path(new_params, job.target_path, acc)
        return new_params

    return jax.jit(apply)


def apply_aggregation(jobs, weights, global_params, stacked_uploads):
    """Run the planned reduction on device.  ``stacked_uploads``:
    {dataset-group: pytree with leading client axis}."""
    weight_res = [jnp.float32(r) for r, _ in weights]
    weight_vecs = [{g: jnp.asarray(v) for g, v in vecs.items()}
                   for _, vecs in weights]
    token = str(jax.tree_util.tree_structure((global_params, stacked_uploads)))
    fn = _compiled_apply(jobs, token)
    return fn(global_params, stacked_uploads, weight_res, weight_vecs)
