"""Model registry: the ``mome_*`` factory family (reference
mome.py:924-1033, registered with timm there; a plain dict here).

``create_model`` mirrors ``FedavgServer._init_model`` (fedavgserver.py:
144-158): one global MAT per client-side dataset with modality-appropriate
None slots, dataset-specific vocab size, and optional pretrained ViT import
for the image tower.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax

from fedcola_tpu.config import (DATASET_2_MODALITY, DATASET_2_TASK,
                                ExperimentConfig, NUM_CLASS, VOCAB_SIZES)
from fedcola_tpu.models.mat import MATConfig, init_mat

logger = logging.getLogger(__name__)

# (embed_dim, depth, num_heads, pretrained timm source, img_size)
MODEL_SIZES = {
    "mome_small_patch16": (384, 12, 6, "vit_small_patch16_224", 224),
    "mome_tiny_patch16": (192, 12, 3, "vit_tiny_patch16_224", 224),
    "mome_small_patch16_224_in21k": (384, 12, 6, "vit_small_patch16_224_in21k", 224),
    "mome_base_patch16_224_ours": (768, 12, 12, "vit_small_patch16_224_ours", 224),
    "mome_toy_patch16_224": (4, 1, 2, None, 224),
    # test-only sizes (not in the reference): tiny everything, 32px
    # images; the vit_test* sources resolve only through the
    # FEDCOLA_PRETRAIN_* env hook (no cache file matches them), letting
    # tests compose --pretrained end-to-end at toy scale
    "mome_test_patch16_32": (8, 2, 2, "vit_test_patch16_32", 32),
    # 16-dim variant: enough feature capacity for convergence tests
    # (8-dim L2-normalized CLS features can't separate a 40-item gallery)
    "mome_test16_patch16_32": (16, 2, 2, "vit_test16_patch16_32", 32),
}


def build_mat_config(model_name: str, cfg: ExperimentConfig,
                     dataset: str) -> MATConfig:
    if model_name not in MODEL_SIZES:
        raise ValueError(f"unknown model {model_name!r}; "
                         f"registered: {sorted(MODEL_SIZES)}")
    embed_dim, depth, num_heads, _, img_size = MODEL_SIZES[model_name]
    modality = DATASET_2_MODALITY[dataset]
    task = DATASET_2_TASK[dataset]
    nc = NUM_CLASS[dataset]
    if modality == "img":
        slots = dict(modalities=("img", None), tasks=(task, None),
                     num_classes=(nc, None))
    elif modality == "txt":
        slots = dict(modalities=(None, "txt"), tasks=(None, task),
                     num_classes=(None, nc))
    else:
        slots = dict(modalities=("img", "txt"), tasks=(task, task),
                     num_classes=(None, None))
    return MATConfig(
        img_size=img_size, patch_size=16,
        embed_dim=embed_dim, depth=depth, num_heads=num_heads,
        vocab_size=VOCAB_SIZES.get(dataset, cfg.vocab_size),
        max_text_len=cfg.seq_len,
        drop_path_rate=cfg.dropout,
        shared_param=cfg.shared_param,
        share_scope=cfg.share_scope,
        colearn_param=cfg.colearn_param,
        with_aux=cfg.with_aux,
        aux_trained=cfg.aux_trained,
        aux_attn_only=cfg.aux_attn_only,
        aux_mlp_only=cfg.aux_mlp_only,
        use_pallas=cfg.use_pallas,
        use_fused_mlp=cfg.use_pallas,
        compute_dtype=cfg.compute_dtype,
        # fully unrolling the layer scan removes the per-layer weight
        # dynamic-slices and activation-stack update-slices from the
        # compiled program (+7% step throughput on v5e at depth 12);
        # the rolled loop is kept for tiny test models where compile
        # time dominates
        scan_unroll=depth if cfg.use_pallas and depth >= 8 else 1,
        **slots,
    )


def create_model(model_name: str, cfg: ExperimentConfig, dataset: str,
                 rng) -> Tuple[MATConfig, dict]:
    mat_cfg = build_mat_config(model_name, cfg, dataset)
    params = init_mat(mat_cfg, rng)
    if cfg.pretrained:
        from fedcola_tpu.models.pretrained import load_pretrained_vit
        src = MODEL_SIZES[model_name][3]
        params = load_pretrained_vit(mat_cfg, params, src)
    return mat_cfg, params
