"""Pretrained ViT import (reference ``pretrain_vit``, mome.py:788-816).

Every canonical script passes ``--pretrained`` (scripts/coco.sh), so the
timm-layout -> stacked-pytree remap (transpose + depth-stack + cls/pos
copy, mome.py:801-813) decides whether the accuracy story holds.  These
tests synthesize a timm-``VisionTransformer`` state dict (random values,
exact timm shapes), import it, and verify (a) a round-trip through
``to_torch_state_dict`` under the reference names, (b) a forward golden
vs an independently-coded torch twin, (c) the aux re-sync for with_aux
models (build_aux re-wiring, mome.py:768-786).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fedcola_tpu.models.mat import MATConfig, init_mat, mat_apply
from fedcola_tpu.models.pretrained import _torch_vit_to_stack, load_pretrained_vit
from fedcola_tpu.models.torch_io import to_torch_state_dict

D, HEADS, DEPTH, IMG, PATCH = 8, 2, 2, 32, 16
HID = 4 * D


def _timm_vit_sd(seed=0):
    """Random state dict in timm VisionTransformer layout/shapes."""
    rng = np.random.RandomState(seed)

    def r(*shape):
        return (rng.randn(*shape) * 0.1).astype(np.float32)

    n_tok = (IMG // PATCH) ** 2 + 1
    sd = {
        "patch_embed.proj.weight": r(D, 3, PATCH, PATCH),
        "patch_embed.proj.bias": r(D),
        "cls_token": r(1, 1, D),
        "pos_embed": r(1, n_tok, D),
    }
    for j in range(DEPTH):
        p = f"blocks.{j}."
        sd[p + "norm1.weight"] = r(D)
        sd[p + "norm1.bias"] = r(D)
        sd[p + "attn.qkv.weight"] = r(3 * D, D)
        sd[p + "attn.qkv.bias"] = r(3 * D)
        sd[p + "attn.proj.weight"] = r(D, D)
        sd[p + "attn.proj.bias"] = r(D)
        sd[p + "norm2.weight"] = r(D)
        sd[p + "norm2.bias"] = r(D)
        sd[p + "mlp.fc1.weight"] = r(HID, D)
        sd[p + "mlp.fc1.bias"] = r(HID)
        sd[p + "mlp.fc2.weight"] = r(D, HID)
        sd[p + "mlp.fc2.bias"] = r(D)
    return sd


def _cfg(**kw):
    base = dict(modalities=("img", "txt"), tasks=("cls", "cls"),
                num_classes=(3, 4), embed_dim=D, depth=DEPTH,
                num_heads=HEADS, img_size=IMG, patch_size=PATCH,
                vocab_size=50, max_text_len=8, use_pallas=False,
                compute_dtype="float32")
    base.update(kw)
    return MATConfig(**base)


def test_remap_roundtrips_through_reference_names():
    """Import then export: every image-tower tensor must come back under
    the reference state_dict names (mome.py:801-813 remap) bit-equal to
    the timm source."""
    cfg = _cfg()
    sd = _timm_vit_sd()
    params = _torch_vit_to_stack(sd, cfg, "0", init_mat(cfg, jax.random.PRNGKey(0)))
    out = to_torch_state_dict(cfg, params)
    np.testing.assert_array_equal(out["embeddings.0.embed.proj.weight"],
                                  sd["patch_embed.proj.weight"])
    np.testing.assert_array_equal(out["embeddings.0.embed.proj.bias"],
                                  sd["patch_embed.proj.bias"])
    np.testing.assert_array_equal(out["embeddings.0.cls_token"],
                                  sd["cls_token"])
    np.testing.assert_array_equal(out["embeddings.0.pos_embed"],
                                  sd["pos_embed"])
    for j in range(DEPTH):
        for suffix in ("norm1.weight", "norm1.bias", "attn.qkv.weight",
                       "attn.qkv.bias", "attn.proj.weight", "attn.proj.bias",
                       "norm2.weight", "norm2.bias", "mlp.fc1.weight",
                       "mlp.fc1.bias", "mlp.fc2.weight", "mlp.fc2.bias"):
            np.testing.assert_array_equal(
                out[f"blockses.0.{j}.{suffix}"], sd[f"blocks.{j}.{suffix}"],
                f"blocks.{j}.{suffix}")


def test_imported_forward_matches_torch_twin():
    """Forward golden: the image tower with imported weights must equal an
    independently-written torch ViT twin (conv patchify + cls/pos +
    pre-LN blocks + final LN(eps 1e-6) + CLS head) on the same pixels."""
    cfg = _cfg()
    sd = _timm_vit_sd(seed=3)
    params = _torch_vit_to_stack(sd, cfg, "0",
                                 init_mat(cfg, jax.random.PRNGKey(1)))
    x = np.random.RandomState(7).randn(2, IMG, IMG, 3).astype(np.float32)
    ours = np.asarray(mat_apply(cfg, params, [jnp.asarray(x), None])[0])

    def t(a):
        return torch.tensor(np.asarray(a, np.float32))

    with torch.no_grad():
        conv = torch.nn.Conv2d(3, D, PATCH, PATCH)
        conv.weight.copy_(t(sd["patch_embed.proj.weight"]))
        conv.bias.copy_(t(sd["patch_embed.proj.bias"]))
        patches = conv(t(x.transpose(0, 3, 1, 2))).flatten(2).transpose(1, 2)
        cls = t(sd["cls_token"]).expand(2, -1, -1)
        h = torch.cat([cls, patches], 1) + t(sd["pos_embed"])
        for j in range(DEPTH):
            p = f"blocks.{j}."
            y = torch.nn.functional.layer_norm(
                h, (D,), t(sd[p + "norm1.weight"]), t(sd[p + "norm1.bias"]),
                1e-5)
            qkv = y @ t(sd[p + "attn.qkv.weight"]).T + t(sd[p + "attn.qkv.bias"])
            B, N = qkv.shape[:2]
            hd = D // HEADS
            qkv = qkv.reshape(B, N, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
            attn = (q.float() @ k.float().transpose(-2, -1)).softmax(-1)
            a = (attn @ v).transpose(1, 2).reshape(B, N, D)
            h = h + a @ t(sd[p + "attn.proj.weight"]).T + t(sd[p + "attn.proj.bias"])
            y = torch.nn.functional.layer_norm(
                h, (D,), t(sd[p + "norm2.weight"]), t(sd[p + "norm2.bias"]),
                1e-5)
            m = torch.nn.functional.gelu(
                y @ t(sd[p + "mlp.fc1.weight"]).T + t(sd[p + "mlp.fc1.bias"]))
            h = h + m @ t(sd[p + "mlp.fc2.weight"]).T + t(sd[p + "mlp.fc2.bias"])
        h = torch.nn.functional.layer_norm(
            h, (D,), t(params["norm"]["scale"]), t(params["norm"]["bias"]),
            1e-6)
        ref = h[:, 0] @ t(params["head"]["0"]["kernel"]) + \
            t(params["head"]["0"]["bias"])
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_aux_resyncs_to_imported_kernels():
    """For uni-modal with_aux models the aux stacks re-sync to the newly
    imported main kernels so W_eff == W at scale 0 (build_aux wiring,
    mome.py:768-786)."""
    cfg = _cfg(modalities=("img", None), tasks=("cls", None),
               num_classes=(3, None), with_aux=True)
    assert cfg.has_aux
    sd = _timm_vit_sd(seed=5)
    params = _torch_vit_to_stack(sd, cfg, "0",
                                 init_mat(cfg, jax.random.PRNGKey(2)))
    for kind, torch_name in (("qkv", "attn.qkv.weight"),
                             ("proj", "attn.proj.weight"),
                             ("fc1", "mlp.fc1.weight"),
                             ("fc2", "mlp.fc2.weight")):
        want = np.stack([np.asarray(sd[f"blocks.{j}.{torch_name}"]).T
                         for j in range(DEPTH)])
        np.testing.assert_array_equal(np.asarray(params["aux"][f"{kind}_aux"]),
                                      want, kind)


def test_load_pretrained_vit_from_env_checkpoint(tmp_path, monkeypatch):
    """End-to-end loader path: FEDCOLA_PRETRAIN_<NAME> .npz checkpoint is
    found, imported into the img slot, and text-slot params are untouched."""
    cfg = _cfg()
    sd = _timm_vit_sd(seed=9)
    path = tmp_path / "vit_test.npz"
    np.savez(str(path), **sd)
    monkeypatch.setenv("FEDCOLA_PRETRAIN_VIT_TEST_PATCH16", str(path))
    init = init_mat(cfg, jax.random.PRNGKey(4))
    loaded = load_pretrained_vit(cfg, init, "vit_test_patch16")
    np.testing.assert_array_equal(
        np.asarray(loaded["blk"]["0"]["qkv_kernel"]),
        np.stack([np.asarray(sd[f"blocks.{j}.attn.qkv.weight"]).T
                  for j in range(DEPTH)]))
    # text tower untouched
    np.testing.assert_array_equal(np.asarray(loaded["emb"]["1"]["word"]),
                                  np.asarray(init["emb"]["1"]["word"]))
