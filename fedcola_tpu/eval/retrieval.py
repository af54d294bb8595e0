"""Image-text retrieval evaluator (reference ``COCOEvaluator``,
src/metrics/eval_coco.py:90-465).

Pipeline parity:
* feature extraction runs the MAT with ``feat_out=True`` over the test set
  (batched, shuffled order like the reference's shuffle=True eval loader,
  eval_coco.py:174-199), dedupes images by image_id keeping first-seen
  order, and re-sorts caption features so each image's 5 captions are
  contiguous (the alignment pass at eval_coco.py:210-221);
* ``evaluate_recall`` replaces the reference's per-query rank loops
  (eval_coco.py:290-351 + ParallelMatMulModule) with one fused device
  computation: a [n_q, n_g] similarity matmul, a double argsort for ranks,
  and a masked min over positives — no host loops;
* ``evaluate_n_fold`` = 5 positional crossfolds of 1k images with the
  matching caption block per fold (= the reference's fixed 5k-caption
  slices when every image has 5 captions, eval_coco.py:353-407);
* returned structure matches ``evaluate`` (eval_coco.py:409-465):
  {'n_fold': {'i2t': {...}, 't2i': {...}}, 'i2t': {...}, 't2i': {...},
  'rsum'/'medr'/'meanr' summed over directions}.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fedcola_tpu.data.datasets import TaskDataset
from fedcola_tpu.models.mat import MATConfig
from fedcola_tpu.parallel.client_update import GroupSpec, build_eval_forward
from fedcola_tpu.utils.dispatch import DispatchWindow


def extract_features(cfg: MATConfig, spec: GroupSpec, params,
                     dataset: TaskDataset, batch_size: int = 512,
                     rng: Optional[np.random.RandomState] = None,
                     mesh_plan=None, resident=None):
    """Returns aligned (image_features [n_img, D], caption_features
    [n_cap, D], image_classes, caption_classes).  With a ``mesh_plan``,
    every feature-extraction batch shards over the whole device mesh (the
    reference runs this single-device; SURVEY.md §2.8 P3).  ``resident``:
    HBM-staged dataset arrays — batches become on-device index gathers
    instead of host pixel transfers.

    Feature arrays come back as DEVICE arrays on the resident
    single-process path (features feed the jitted rank computations next
    — shipping them host and back is pure wire time) and as numpy
    otherwise; both duck-type for every downstream consumer."""
    if resident is not None and (mesh_plan is None
                                 or not mesh_plan.is_multiprocess):
        return _extract_features_resident(cfg, spec, params, dataset,
                                          batch_size, rng, mesh_plan,
                                          resident)
    fwd = build_eval_forward(cfg, spec, resident=resident is not None)
    n = dataset.n
    if mesh_plan is not None:
        batch_size = mesh_plan.pad_eval_batch(batch_size)
        params = mesh_plan.replicate(params)
    order = np.arange(n)
    if rng is not None:
        rng.shuffle(order)

    fi_parts = []
    ft_parts = []

    # keep several batches in flight before reading back: jax dispatch is
    # async, so the device pipelines while the host queues/gathers — a
    # per-batch np.asarray would cap the pipeline at one program deep,
    # while unbounded dispatch would pin every host-fed batch's input
    # buffers in HBM at once (the window bounds that)
    def drain_one(fi, ft, idx):
        if mesh_plan is not None:
            fi_parts.append(mesh_plan.to_host(fi)[:len(idx)]
                            .astype(np.float32))
            ft_parts.append(mesh_plan.to_host(ft)[:len(idx)]
                            .astype(np.float32))
        else:
            fi_parts.append(np.asarray(fi[:len(idx)], np.float32))
            ft_parts.append(np.asarray(ft[:len(idx)], np.float32))

    window = DispatchWindow(drain_one)
    from fedcola_tpu.utils.dispatch import pad_batch_indices
    for start in range(0, n, batch_size):
        idx = order[start:start + batch_size]
        gidx = pad_batch_indices(idx, batch_size)
        if resident is not None:
            batch = {"idx": gidx.astype(np.int32)}
        else:
            batch = {
                "x": dataset.load_images(gidx),
                "y": dataset.texts[gidx],
            }
        if mesh_plan is not None:
            batch = mesh_plan.shard_eval_batch(batch)
        fi, ft = (fwd(params, batch, resident) if resident is not None
                  else fwd(params, batch))
        window.push(fi, ft, idx)
    window.flush()

    fi_all = np.concatenate(fi_parts)
    ft_all = np.concatenate(ft_parts)
    ids = np.asarray(dataset.image_ids)[order]
    img_rows, image_classes, sorted_idx = _dedup_align(ids)
    return (fi_all[img_rows], ft_all[sorted_idx],
            image_classes, ids[sorted_idx])


def _dedup_align(ids: np.ndarray):
    """First-seen image dedup + caption alignment from the extraction-order
    image-id vector (one entry per caption row).

    Dedup keeps each image's FIRST row (eval_coco.py:205-209); alignment
    groups captions behind their image's first-seen position
    (eval_coco.py:210-221).  A stable argsort on that position reproduces
    the reference's per-image where() scan exactly (same group order,
    original order within a group) in O(n log n) instead of
    O(n_img * n_cap) — at 5k x 25k that loop was 125M comparisons per
    central eval, every round at --eval_every 1.  Returns ``(img_rows,
    image_classes, sorted_idx)``; shared by the host-roundtrip and
    device-resident extraction paths so their semantics cannot diverge."""
    first_pos: Dict[int, int] = {}
    img_rows = []
    image_classes = []
    for j, iid in enumerate(ids.tolist()):
        if iid not in first_pos:
            first_pos[iid] = len(img_rows)
            img_rows.append(j)
            image_classes.append(iid)
    keys = np.fromiter((first_pos[i] for i in ids.tolist()), np.int64,
                       len(ids))
    sorted_idx = np.argsort(keys, kind="stable")
    return (np.asarray(img_rows, np.int64), np.asarray(image_classes),
            sorted_idx)


def _run_chunked(fwd, params, indices, K, batch_size, resident, mesh_plan):
    """Drive a chunked single/dual-tower eval forward over ``indices`` in
    [K, B] pieces; returns the device feature array(s) trimmed to
    ``len(indices)``."""
    m = len(indices)
    n_chunks = -(-m // (K * batch_size))
    padded = np.full((n_chunks * K * batch_size,), indices[0], np.int32)
    padded[:m] = indices
    outs = None
    for c in range(n_chunks):
        idxs = padded[c * K * batch_size:(c + 1) * K * batch_size] \
            .reshape(K, batch_size)
        if mesh_plan is not None:
            idxs = mesh_plan.shard_eval_chunk(idxs)
        f = fwd(params, idxs, resident)
        parts = f if isinstance(f, tuple) else (f,)
        if outs is None:
            outs = tuple([] for _ in parts)
        for o, p in zip(outs, parts):
            o.append(p.reshape(-1, p.shape[-1]))
    flat = tuple(jnp.concatenate(o)[:m] if len(o) > 1 else o[0][:m]
                 for o in outs)
    return flat if len(flat) > 1 else flat[0]


def _extract_features_resident(cfg: MATConfig, spec: GroupSpec, params,
                               dataset: TaskDataset, batch_size: int,
                               rng, mesh_plan, resident):
    """Device-resident extraction: K batches per jitted call
    (``build_eval_forward_chunked``) and features kept ON DEVICE
    end-to-end.  Dedup/alignment need only the host-known image ids, so
    they become index computations applied as device gathers — the only
    host<->device traffic of the whole retrieval eval is then the index
    chunks in and the per-query best-rank vectors out (kilobytes), vs
    ~120 MB of feature readback + re-upload at the COCO 25k/5k shape on
    the host-roundtrip path.  Chunk depth: FEDCOLA_EVAL_CHUNK_STEPS
    (default 8).

    Deduped-store datasets (path-backed COCO/Flickr) additionally SPLIT
    the towers: the txt tower runs per caption row but the img tower runs
    once per UNIQUE image (``img_store`` row) instead of once per caption
    — bit-identical features (the eval forward is per-sample
    deterministic; duplicate rows of one image always produced identical
    features that dedup then discarded) at ~1/5 the img-tower FLOPs,
    which at the COCO 25k/5k shape is ~3x less extraction work — the
    dominant retrieval-eval cost (BENCH_NOTES round-4 scale math).  The
    reference pays the per-row cost (eval_coco.py:135-240); ours is the
    same math computed once.  FEDCOLA_EVAL_UNIQUE_IMAGES=0 restores the
    joint per-row path."""
    from fedcola_tpu.parallel.client_update import (
        build_eval_forward_chunked, build_eval_img_store_forward_chunked,
        build_eval_txt_forward_chunked)
    K = int(os.environ.get("FEDCOLA_EVAL_CHUNK_STEPS", "8"))
    n = dataset.n
    if mesh_plan is not None:
        batch_size = mesh_plan.pad_eval_batch(batch_size)
        params = mesh_plan.replicate(params)
    order = np.arange(n)
    if rng is not None:
        rng.shuffle(order)
    ids = np.asarray(dataset.image_ids)[order]
    img_rows, image_classes, sorted_idx = _dedup_align(ids)

    if ("img_store" in resident
            and os.environ.get("FEDCOLA_EVAL_UNIQUE_IMAGES", "1") == "1"):
        ft_all = _run_chunked(build_eval_txt_forward_chunked(cfg, spec),
                              params, order, K, batch_size, resident,
                              mesh_plan)
        n_unique = int(resident["img_store"].shape[0])
        fi_unique = _run_chunked(
            build_eval_img_store_forward_chunked(cfg, spec), params,
            np.arange(n_unique, dtype=np.int32), K, batch_size, resident,
            mesh_plan)
        # first-seen dedup row -> its unique-store row
        store_row = np.asarray(dataset._image_row)[order[img_rows]]
        image_features = jnp.take(
            fi_unique, jnp.asarray(store_row.astype(np.int32)), axis=0)
        caption_features = jnp.take(
            ft_all, jnp.asarray(sorted_idx.astype(np.int32)), axis=0)
        return (image_features, caption_features, image_classes,
                ids[sorted_idx])

    fi_all, ft_all = _run_chunked(build_eval_forward_chunked(cfg, spec),
                                  params, order, K, batch_size, resident,
                                  mesh_plan)
    image_features = jnp.take(
        fi_all, jnp.asarray(img_rows.astype(np.int32)), axis=0)
    caption_features = jnp.take(
        ft_all, jnp.asarray(sorted_idx.astype(np.int32)), axis=0)
    return (image_features, caption_features, image_classes,
            ids[sorted_idx])


@jax.jit
def _best_positive_ranks(q: jnp.ndarray, g: jnp.ndarray,
                         q_cls: jnp.ndarray, g_cls: jnp.ndarray) -> jnp.ndarray:
    """For each query: the best (smallest) rank among its positive gallery
    items under descending similarity."""
    sims = q @ g.T                                    # [nq, ng]
    order = jnp.argsort(-sims, axis=1)
    ranks = jnp.argsort(order, axis=1)                # rank of each gallery
    pos = q_cls[:, None] == g_cls[None, :]
    big = jnp.iinfo(jnp.int32).max
    return jnp.min(jnp.where(pos, ranks, big), axis=1)


def evaluate_recall(q_features, g_features, q_classes, g_classes) -> Dict[str, float]:
    best = np.asarray(_best_positive_ranks(
        jnp.asarray(q_features), jnp.asarray(g_features),
        jnp.asarray(q_classes), jnp.asarray(g_classes)))
    scores = {
        "recall_1": float(np.mean(best < 1)),
        "recall_5": float(np.mean(best < 5)),
        "recall_10": float(np.mean(best < 10)),
    }
    scores["rsum"] = scores["recall_1"] + scores["recall_5"] + scores["recall_10"]
    scores["medr"] = float(np.floor(np.median(best)) + 1)
    scores["meanr"] = float(np.mean(best) + 1)
    return scores


def evaluate_n_fold(image_features, caption_features, image_classes,
                    caption_classes, n_crossfolds: int = 5,
                    n_images_per_fold: int = 1000) -> Dict[str, Dict[str, float]]:
    """Positional crossfolds (eval_coco.py:353-407).  Caption fold
    boundaries are derived from the image fold via the grouped caption
    order (captions are sorted behind their image's position by
    ``extract_features``): with exactly 5 captions/image this reproduces
    the reference's fixed 5000-caption slices bit-for-bit, and with
    ragged caption counts it keeps every fold's captions inside the
    fold's image gallery — the reference's fixed slices would misalign
    there, leaving t2i queries with no positive in the gallery."""
    pos_of = {c: i for i, c in enumerate(image_classes.tolist())}
    cap_pos = np.fromiter((pos_of[c] for c in caption_classes.tolist()),
                          np.int64, len(caption_classes))  # non-decreasing
    folds = {"i2t": [], "t2i": []}
    for k in range(n_crossfolds):
        a, b = k * n_images_per_fold, (k + 1) * n_images_per_fold
        ca = int(np.searchsorted(cap_pos, a, "left"))
        cb = int(np.searchsorted(cap_pos, b, "left"))
        isl, csl = slice(a, b), slice(ca, cb)
        if (len(image_features[isl]) == 0
                or len(caption_features[csl]) == 0):
            continue   # tiny gallery: fewer populated folds than requested
        folds["i2t"].append(evaluate_recall(
            image_features[isl], caption_features[csl],
            image_classes[isl], caption_classes[csl]))
        folds["t2i"].append(evaluate_recall(
            caption_features[csl], image_features[isl],
            caption_classes[csl], image_classes[isl]))
    out = {}
    for d in ("i2t", "t2i"):
        keys = folds[d][0].keys()
        out[d] = {k: float(np.mean([f[k] for f in folds[d]])) for k in keys}
    return out


def evaluate(cfg: MATConfig, spec: GroupSpec, params, dataset: TaskDataset,
             batch_size: int = 512, n_crossfolds: int = 5,
             rng: Optional[np.random.RandomState] = None,
             mesh_plan=None, resident=None) -> Dict:
    imf, capf, imc, capc = extract_features(cfg, spec, params, dataset,
                                            batch_size, rng, mesh_plan,
                                            resident)
    scores: Dict = {}
    if n_crossfolds > 0 and len(imf) >= n_crossfolds * 1000:
        scores["n_fold"] = evaluate_n_fold(imf, capf, imc, capc, n_crossfolds)
    elif n_crossfolds > 0:
        # small datasets: image folds scale down proportionally (caption
        # folds follow the image fold inside evaluate_n_fold)
        nipf = max(len(imf) // n_crossfolds, 1)
        scores["n_fold"] = evaluate_n_fold(imf, capf, imc, capc,
                                           n_crossfolds, nipf)
    scores["i2t"] = evaluate_recall(imf, capf, imc, capc)
    scores["t2i"] = evaluate_recall(capf, imf, capc, imc)
    for key in ("rsum", "medr", "meanr"):
        scores[key] = scores["i2t"][key] + scores["t2i"][key]
    return scores
