"""Torch-state_dict interop: export -> import roundtrip, torch-layout
shapes, aux fold-in numerics."""

import jax
import jax.numpy as jnp
import numpy as np

from fedcola_tpu.federation.aux import exchange_aux_weights, fold_aux_into_upload
from fedcola_tpu.models.mat import MATConfig, init_mat, mat_apply
from fedcola_tpu.models.torch_io import (from_torch_state_dict,
                                         to_torch_state_dict)

CFG = MATConfig(modalities=("img", "txt"), tasks=("rtv", "rtv"),
                num_classes=(None, None), img_size=32, patch_size=16,
                embed_dim=8, depth=2, num_heads=2, vocab_size=50,
                max_text_len=10, use_pallas=False, compute_dtype="float32")
AUXCFG = MATConfig(modalities=("img", None), tasks=("cls", None),
                   num_classes=(7, None), img_size=32, patch_size=16,
                   embed_dim=8, depth=2, num_heads=2, with_aux=True,
                   aux_trained=True, use_pallas=False,
                   compute_dtype="float32")


def test_roundtrip_identity():
    params = init_mat(CFG, jax.random.PRNGKey(0))
    sd = to_torch_state_dict(CFG, params)
    # torch layouts
    assert sd["blockses.0.0.attn.qkv.weight"].shape == (24, 8)   # [out, in]
    assert sd["embeddings.0.embed.proj.weight"].shape == (8, 3, 16, 16)
    other = init_mat(CFG, jax.random.PRNGKey(1))
    restored = from_torch_state_dict(CFG, other, sd)
    img = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    txt = jnp.zeros((2, 10), jnp.int32)
    o1 = mat_apply(CFG, params, [img, txt], feat_out=True)
    o2 = mat_apply(CFG, restored, [img, txt], feat_out=True)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(o1[1]), np.asarray(o2[1]),
                               rtol=1e-6)


def test_aux_export_and_fold():
    params = init_mat(AUXCFG, jax.random.PRNGKey(0))
    params["aux"]["qkv_scale"] = params["aux"]["qkv_scale"] + 0.25
    sd = to_torch_state_dict(AUXCFG, params)
    assert "blockses.0.0.attn.qkv.aux_weight" in sd
    assert sd["blockses.0.1.attn.qkv.cross_modal_scale"].shape == (1,)

    # fold-in: W <- W + scale * W_aux, aux stripped (fedavgclient.py:158-184)
    folded = fold_aux_into_upload(AUXCFG, params)
    assert "aux" not in folded
    expect = np.asarray(params["blk"]["0"]["qkv_kernel"]) \
        + 0.25 * np.asarray(params["aux"]["qkv_aux"])
    np.testing.assert_allclose(np.asarray(folded["blk"]["0"]["qkv_kernel"]),
                               expect, rtol=1e-6)
    # non-reparam leaves untouched
    np.testing.assert_array_equal(
        np.asarray(folded["blk"]["0"]["norm1_scale"]),
        np.asarray(params["blk"]["0"]["norm1_scale"]))


def test_aux_exchange_slots():
    """img model aux <- txt model's blockses.1 kernels and vice versa
    (fedavgserver.py:821-845)."""
    txtcfg = MATConfig(modalities=(None, "txt"), tasks=(None, "cls"),
                       num_classes=(None, 3), embed_dim=8, depth=2,
                       num_heads=2, vocab_size=50, max_text_len=10,
                       img_size=32, with_aux=True, aux_trained=True,
                       use_pallas=False, compute_dtype="float32")
    gp = {"IMG": init_mat(AUXCFG, jax.random.PRNGKey(0)),
          "TXT": init_mat(txtcfg, jax.random.PRNGKey(1))}
    new = exchange_aux_weights(gp, {"IMG": AUXCFG, "TXT": txtcfg},
                               {"IMG": "img", "TXT": "txt"})
    np.testing.assert_array_equal(
        np.asarray(new["IMG"]["aux"]["fc1_aux"]),
        np.asarray(gp["TXT"]["blk"]["1"]["fc1_kernel"]))
    np.testing.assert_array_equal(
        np.asarray(new["TXT"]["aux"]["proj_aux"]),
        np.asarray(gp["IMG"]["blk"]["0"]["proj_kernel"]))
    # scales stay zero (not exchanged; mome.py:862-878 matches 'aux' only)
    assert np.all(np.asarray(new["IMG"]["aux"]["qkv_scale"]) == 0)
