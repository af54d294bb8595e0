"""Torch-state_dict interop: export/import MAT parameters under the exact
per-layer names and layouts of the reference's ``ModalityAgnosticTransformer``
(mome.py:671-922), so checkpoints move both ways between this framework and
the PyTorch reference (torch Linear/Conv weights are [out, in] /
[out, in, kh, kw]; ours are [in, out] / [kh, kw, in, out], stacked on a
leading depth axis)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from fedcola_tpu.models.mat import MATConfig, Params

_BLK_TORCH = {
    "norm1_scale": ("norm1.weight", False),
    "norm1_bias": ("norm1.bias", False),
    "qkv_kernel": ("attn.qkv.weight", True),
    "qkv_bias": ("attn.qkv.bias", False),
    "proj_kernel": ("attn.proj.weight", True),
    "proj_bias": ("attn.proj.bias", False),
    "norm2_scale": ("norm2.weight", False),
    "norm2_bias": ("norm2.bias", False),
    "fc1_kernel": ("mlp.fc1.weight", True),
    "fc1_bias": ("mlp.fc1.bias", False),
    "fc2_kernel": ("mlp.fc2.weight", True),
    "fc2_bias": ("mlp.fc2.bias", False),
}


def to_torch_state_dict(cfg: MATConfig, params: Params) -> Dict[str, np.ndarray]:
    """Flat numpy dict with reference state_dict names (per depth layer)."""
    sd: Dict[str, np.ndarray] = {}
    for i, modality in enumerate(cfg.modalities):
        s = str(i)
        if modality == "img":
            e = params["emb"][s]
            sd[f"embeddings.{i}.embed.proj.weight"] = \
                np.asarray(e["patch_kernel"]).transpose(3, 2, 0, 1)
            sd[f"embeddings.{i}.embed.proj.bias"] = np.asarray(e["patch_bias"])
            sd[f"embeddings.{i}.cls_token"] = np.asarray(e["cls"])
            sd[f"embeddings.{i}.pos_embed"] = np.asarray(e["pos"])
        elif modality == "txt":
            e = params["emb"][s]
            p = f"embeddings.{i}.text_embeddings"
            sd[f"{p}.word_embeddings.weight"] = np.asarray(e["word"])
            sd[f"{p}.position_embeddings.weight"] = np.asarray(e["posemb"])
            sd[f"{p}.token_type_embeddings.weight"] = np.asarray(e["toktype"])
            sd[f"{p}.LayerNorm.weight"] = np.asarray(e["ln_scale"])
            sd[f"{p}.LayerNorm.bias"] = np.asarray(e["ln_bias"])
        if modality is None:
            continue
        blk = params["blk"].get(s)
        for leaf, (suffix, transpose) in _BLK_TORCH.items():
            src_slot = s
            src_leaf = leaf
            if blk is None or leaf not in blk:
                # colearn-attn tied leaves live on the main slot
                src_slot = str(cfg.main_slot)
                src_leaf = leaf
            arr = np.asarray(params["blk"][src_slot][src_leaf])
            for j in range(cfg.depth):
                v = arr[j]
                sd[f"blockses.{i}.{j}.{suffix}"] = v.T if transpose else v
    sd["norm.weight"] = np.asarray(params["norm"]["scale"])
    sd["norm.bias"] = np.asarray(params["norm"]["bias"])
    for i, task in enumerate(cfg.tasks):
        if task == "cls":
            h = params["head"][str(i)]
            sd[f"heads.{i}.head.weight"] = np.asarray(h["kernel"]).T
            sd[f"heads.{i}.head.bias"] = np.asarray(h["bias"])
    if cfg.has_aux and "aux" in params:
        main = cfg.main_slot
        layer_of = {"qkv": "attn.qkv", "proj": "attn.proj",
                    "fc1": "mlp.fc1", "fc2": "mlp.fc2"}
        for kind in cfg.aux_layer_kinds:
            aux = np.asarray(params["aux"][f"{kind}_aux"])
            scale = np.asarray(params["aux"][f"{kind}_scale"])
            for j in range(cfg.depth):
                base = f"blockses.{main}.{j}.{layer_of[kind]}"
                sd[f"{base}.aux_weight"] = aux[j].T
                sd[f"{base}.cross_modal_scale"] = scale[j:j + 1]
    return sd


def from_torch_state_dict(cfg: MATConfig, params: Params,
                          sd: Dict[str, np.ndarray]) -> Params:
    """Load reference-named tensors into (a copy of) the structured tree.
    Missing keys keep current values (load_state_dict(strict=False))."""
    import jax.numpy as jnp

    def put(node_path, value):
        node = out
        for p in node_path[:-1]:
            node = node[p]
        node[node_path[-1]] = jnp.asarray(value)

    def copy_tree(t):
        return {k: copy_tree(v) if isinstance(v, dict) else v
                for k, v in t.items()}

    out = copy_tree(params)
    for i, modality in enumerate(cfg.modalities):
        s = str(i)
        if modality == "img":
            k = f"embeddings.{i}.embed.proj.weight"
            if k in sd:
                put(("emb", s, "patch_kernel"),
                    np.asarray(sd[k]).transpose(2, 3, 1, 0))
            for name, leaf in ((f"embeddings.{i}.embed.proj.bias", "patch_bias"),
                               (f"embeddings.{i}.cls_token", "cls"),
                               (f"embeddings.{i}.pos_embed", "pos")):
                if name in sd:
                    put(("emb", s, leaf), sd[name])
        elif modality == "txt":
            p = f"embeddings.{i}.text_embeddings"
            for name, leaf in ((f"{p}.word_embeddings.weight", "word"),
                               (f"{p}.position_embeddings.weight", "posemb"),
                               (f"{p}.token_type_embeddings.weight", "toktype"),
                               (f"{p}.LayerNorm.weight", "ln_scale"),
                               (f"{p}.LayerNorm.bias", "ln_bias")):
                if name in sd:
                    put(("emb", s, leaf), sd[name])
        if modality is None or s not in out["blk"]:
            continue
        for leaf, (suffix, transpose) in _BLK_TORCH.items():
            if leaf not in out["blk"][s]:
                continue  # colearn-tied leaf lives on the main slot
            rows = []
            ok = True
            for j in range(cfg.depth):
                k = f"blockses.{i}.{j}.{suffix}"
                if k not in sd:
                    ok = False
                    break
                v = np.asarray(sd[k])
                rows.append(v.T if transpose else v)
            if ok:
                put(("blk", s, leaf), np.stack(rows))
    # strict=False contract everywhere: a group loads only when ALL of
    # its paired keys are present (the per-depth block loop's `ok`
    # pattern); a partial/filtered state_dict skips the group instead of
    # raising KeyError on the missing half
    if "norm.weight" in sd and "norm.bias" in sd:
        put(("norm", "scale"), sd["norm.weight"])
        put(("norm", "bias"), sd["norm.bias"])
    for i, task in enumerate(cfg.tasks):
        if (task == "cls" and f"heads.{i}.head.weight" in sd
                and f"heads.{i}.head.bias" in sd):
            put(("head", str(i), "kernel"),
                np.asarray(sd[f"heads.{i}.head.weight"]).T)
            put(("head", str(i), "bias"), sd[f"heads.{i}.head.bias"])
    if cfg.has_aux and "aux" in out:
        main = cfg.main_slot
        layer_of = {"qkv": "attn.qkv", "proj": "attn.proj",
                    "fc1": "mlp.fc1", "fc2": "mlp.fc2"}
        for kind in cfg.aux_layer_kinds:
            auxs, scales, ok = [], [], True
            for j in range(cfg.depth):
                base = f"blockses.{main}.{j}.{layer_of[kind]}"
                if (f"{base}.aux_weight" not in sd
                        or f"{base}.cross_modal_scale" not in sd):
                    ok = False
                    break
                auxs.append(np.asarray(sd[f"{base}.aux_weight"]).T)
                scales.append(np.asarray(sd[f"{base}.cross_modal_scale"])[0])
            if ok:
                put(("aux", f"{kind}_aux"), np.stack(auxs))
                put(("aux", f"{kind}_scale"), np.stack(scales))
    return out
