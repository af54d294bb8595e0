"""Numerics parity vs independent torch implementations.

These tests inject identical weights into (a) our JAX MAT pieces and (b)
freshly-written torch modules with the reference's semantics (fp32
attention softmax, LayerNorm eps, exact GELU, HF BertEmbeddings), then
compare outputs.  This guards the subtle numerics that decide whether
retrieval R@1 matches the reference (SURVEY.md §7 hard parts).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fedcola_tpu.models.mat import MATConfig, init_mat, mat_apply
from fedcola_tpu.ops.attention import multi_head_attention

torch.manual_seed(0)


def test_attention_matches_torch():
    D, H, B, N = 16, 4, 3, 10
    rng = np.random.RandomState(0)
    x = rng.randn(B, N, D).astype(np.float32)
    qkv_k = rng.randn(D, 3 * D).astype(np.float32) * 0.1
    qkv_b = rng.randn(3 * D).astype(np.float32) * 0.1
    proj_k = rng.randn(D, D).astype(np.float32) * 0.1
    proj_b = rng.randn(D).astype(np.float32) * 0.1

    ours = multi_head_attention(jnp.asarray(x), jnp.asarray(qkv_k),
                                jnp.asarray(qkv_b), jnp.asarray(proj_k),
                                jnp.asarray(proj_b), H, use_pallas=False)

    # torch version with the reference's exact recipe (mome.py:150-168)
    xt = torch.tensor(x)
    qkv = xt @ torch.tensor(qkv_k) + torch.tensor(qkv_b)
    hd = D // H
    qkv = qkv.reshape(B, N, 3, H, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (hd ** -0.5)
    attn = (q.float() @ k.float().transpose(-2, -1)).softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, D)
    ref = out @ torch.tensor(proj_k) + torch.tensor(proj_b)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_text_embedding_matches_hf_bert():
    from transformers.models.bert.modeling_bert import (BertConfig,
                                                        BertEmbeddings)
    V, D, L = 50, 16, 12
    bc = BertConfig(vocab_size=V, hidden_size=D, max_position_embeddings=L,
                    hidden_dropout_prob=0.0, position_embedding_type="absolute")
    emb = BertEmbeddings(bc).eval()

    cfg = MATConfig(modalities=(None, "txt"), tasks=(None, "cls"),
                    num_classes=(None, 4), embed_dim=D, depth=1, num_heads=2,
                    vocab_size=V, max_text_len=L, img_size=32,
                    use_pallas=False, compute_dtype="float32")
    params = init_mat(cfg, jax.random.PRNGKey(0))
    t = params["emb"]["1"]
    t["word"] = jnp.asarray(emb.word_embeddings.weight.detach().numpy())
    t["posemb"] = jnp.asarray(emb.position_embeddings.weight.detach().numpy())
    t["toktype"] = jnp.asarray(
        emb.token_type_embeddings.weight.detach().numpy())
    t["ln_scale"] = jnp.asarray(emb.LayerNorm.weight.detach().numpy())
    t["ln_bias"] = jnp.asarray(emb.LayerNorm.bias.detach().numpy())

    ids = np.random.RandomState(1).randint(0, V, (3, L))
    from fedcola_tpu.models.mat import _embed_text
    ours = _embed_text(cfg, t, jnp.asarray(ids), False, None)
    with torch.no_grad():
        ref = emb(torch.tensor(ids))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_full_block_matches_torch():
    """One transformer block: pre-LN(eps 1e-5) -> attn -> residual ->
    pre-LN -> exact-GELU MLP -> residual (mome.py:186-228)."""
    D, H, B, N = 8, 2, 2, 6
    cfg = MATConfig(modalities=("img", None), tasks=("cls", None),
                    num_classes=(3, None), embed_dim=D, depth=1, num_heads=H,
                    img_size=32, patch_size=16, use_pallas=False,
                    compute_dtype="float32")
    params = init_mat(cfg, jax.random.PRNGKey(3))
    blk = params["blk"]["0"]
    x = np.random.RandomState(2).randn(B, N, D).astype(np.float32)

    from fedcola_tpu.models.mat import _run_stack
    ours = _run_stack(cfg, blk, jnp.asarray(x), False, None)

    def t(a):
        return torch.tensor(np.asarray(a))

    xt = torch.tensor(x)
    h = torch.nn.functional.layer_norm(
        xt, (D,), t(blk["norm1_scale"][0]), t(blk["norm1_bias"][0]), 1e-5)
    qkv = h @ t(blk["qkv_kernel"][0]) + t(blk["qkv_bias"][0])
    hd = D // H
    qkv = qkv.reshape(B, N, 3, H, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
    attn = (q.float() @ k.float().transpose(-2, -1)).softmax(-1)
    a = (attn @ v).transpose(1, 2).reshape(B, N, D)
    a = a @ t(blk["proj_kernel"][0]) + t(blk["proj_bias"][0])
    xt = xt + a
    h = torch.nn.functional.layer_norm(
        xt, (D,), t(blk["norm2_scale"][0]), t(blk["norm2_bias"][0]), 1e-5)
    m = h @ t(blk["fc1_kernel"][0]) + t(blk["fc1_bias"][0])
    m = torch.nn.functional.gelu(m)   # exact erf GELU (torch default)
    m = m @ t(blk["fc2_kernel"][0]) + t(blk["fc2_bias"][0])
    ref = xt + m
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_patch_embed_matches_torch_conv():
    """reshape+matmul patchify == Conv2d(kernel=stride=patch)
    (mome.py:232-266 PatchEmbed)."""
    cfg = MATConfig(modalities=("img", None), tasks=("cls", None),
                    num_classes=(3, None), embed_dim=8, depth=1, num_heads=2,
                    img_size=32, patch_size=16, use_pallas=False,
                    compute_dtype="float32")
    params = init_mat(cfg, jax.random.PRNGKey(0))
    emb = params["emb"]["0"]
    x = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)

    from fedcola_tpu.models.mat import _embed_image
    ours = _embed_image(cfg, emb, jnp.asarray(x), False, None)

    conv = torch.nn.Conv2d(3, 8, 16, 16)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(
            np.asarray(emb["patch_kernel"]).transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.tensor(np.asarray(emb["patch_bias"])))
        patches = conv(torch.tensor(x.transpose(0, 3, 1, 2)))
        patches = patches.flatten(2).transpose(1, 2)     # [B, N, D]
        cls = torch.tensor(np.asarray(emb["cls"])).expand(2, -1, -1)
        ref = torch.cat([cls, patches], 1) + torch.tensor(np.asarray(emb["pos"]))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-5)
