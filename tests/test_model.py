"""MAT model unit tests: shapes, modality slots, aux reparam, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedcola_tpu.models.mat import MATConfig, init_mat, mat_apply, param_count
from fedcola_tpu.models import naming

TOY = MATConfig(
    modalities=("img", "txt"), tasks=("rtv", "rtv"), num_classes=(None, None),
    img_size=32, patch_size=16, embed_dim=8, depth=2, num_heads=2,
    vocab_size=100, max_text_len=12, use_pallas=False,
    compute_dtype="float32",
)

IMG_ONLY = TOY.replace(modalities=("img", None), tasks=("cls", None),
                       num_classes=(10, None))
TXT_ONLY = TOY.replace(modalities=(None, "txt"), tasks=(None, "cls"),
                       num_classes=(None, 5))


def test_mm_forward_shapes():
    params = init_mat(TOY, jax.random.PRNGKey(0))
    img = jnp.zeros((3, 32, 32, 3))
    txt = jnp.zeros((3, 12), jnp.int32)
    outs = mat_apply(TOY, params, [img, txt], feat_out=True)
    assert outs[0].shape == (3, 8) and outs[1].shape == (3, 8)
    # L2-normalised CLS features (mome.py:911-915)
    np.testing.assert_allclose(np.linalg.norm(outs[0], axis=-1), 1.0, rtol=1e-5)


def test_unimodal_slots():
    p_img = init_mat(IMG_ONLY, jax.random.PRNGKey(0))
    p_txt = init_mat(TXT_ONLY, jax.random.PRNGKey(0))
    assert "0" in p_img["blk"] and "1" not in p_img["blk"]
    assert "1" in p_txt["blk"] and "0" not in p_txt["blk"]
    img = jnp.zeros((2, 32, 32, 3))
    outs = mat_apply(IMG_ONLY, p_img, [img, None])
    assert outs[0].shape == (2, 10) and outs[1] is None
    txt = jnp.zeros((2, 12), jnp.int32)
    outs = mat_apply(TXT_ONLY, p_txt, [None, txt])
    assert outs[1].shape == (2, 5) and outs[0] is None


def test_grayscale_repeat():
    """1-channel inputs repeat to 3 channels (mome.py:893-894)."""
    params = init_mat(IMG_ONLY, jax.random.PRNGKey(0))
    g = jnp.ones((2, 32, 32, 1))
    rgb = jnp.ones((2, 32, 32, 3))
    o1 = mat_apply(IMG_ONLY, params, [g, None])[0]
    o2 = mat_apply(IMG_ONLY, params, [rgb, None])[0]
    np.testing.assert_allclose(o1, o2, rtol=1e-6)


def test_aux_scale_zero_is_identity():
    """With cross_modal_scale init 0, aux must not change the forward
    (mome.py:49,58-60)."""
    cfg = IMG_ONLY.replace(with_aux=True, aux_trained=True)
    params_aux = init_mat(cfg, jax.random.PRNGKey(0))
    params_plain = {k: v for k, v in params_aux.items() if k != "aux"}
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    o1 = mat_apply(cfg, params_aux, [img, None])[0]
    o2 = mat_apply(IMG_ONLY, params_plain, [img, None])[0]
    np.testing.assert_allclose(o1, o2, rtol=1e-6)


def test_aux_nonzero_scale_changes_forward():
    cfg = IMG_ONLY.replace(with_aux=True, aux_trained=True)
    params = init_mat(cfg, jax.random.PRNGKey(0))
    params["aux"]["qkv_scale"] = params["aux"]["qkv_scale"] + 0.5
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    base = {k: v for k, v in params.items() if k != "aux"}
    o1 = mat_apply(cfg, params, [img, None])[0]
    o2 = mat_apply(IMG_ONLY, base, [img, None])[0]
    assert not np.allclose(o1, o2)


@pytest.mark.parametrize("aux_trained", [False, True])
def test_aux_trained_flag_freezes_aux_weights(aux_trained):
    """aux_trained=False freezes aux weights but keeps cross_modal_scale
    trainable (reference mome.py:47-53: aux_weight.requires_grad_(False),
    wired at mome.py:786).  Round 1 shipped a silent divergence here: aux
    weights always received gradients."""
    from fedcola_tpu.parallel.client_update import (GroupSpec,
                                                    build_group_update)
    from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state

    cfg = IMG_ONLY.replace(with_aux=True, aux_trained=aux_trained)
    params = init_mat(cfg, jax.random.PRNGKey(0))
    # nonzero scales so aux weights get nonzero grads when trainable
    for kind in cfg.aux_layer_kinds:
        params["aux"][f"{kind}_scale"] = (
            params["aux"][f"{kind}_scale"] + 0.3)
    n = 1
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape) + 0, params)
    opt = OptimizerSpec(name="AdamW")
    opt_state = init_opt_state(opt, stacked, n)
    spec = GroupSpec(modality="img", criterion="CrossEntropyLoss")
    update = build_group_update(cfg, spec, opt, None)
    rng = np.random.RandomState(0)
    chunk = {
        "x": rng.randint(0, 255, (n, 2, 4, 32, 32, 3)).astype(np.uint8),
        "y": rng.randint(0, 10, (n, 2, 4)).astype(np.int32),
        "valid": np.ones((n, 2, 4), bool),
        "step_valid": np.ones((n, 2), bool),
    }
    rngs = jax.random.split(jax.random.PRNGKey(1), n)
    new_params, _, _ = update(stacked, opt_state,
                              {k: jnp.asarray(v) for k, v in chunk.items()},
                              rngs, jnp.float32(1e-2), params)
    for kind in cfg.aux_layer_kinds:
        aux_moved = not np.allclose(np.asarray(new_params["aux"][f"{kind}_aux"][0]),
                                    np.asarray(params["aux"][f"{kind}_aux"]))
        scale_moved = not np.allclose(
            np.asarray(new_params["aux"][f"{kind}_scale"][0]),
            np.asarray(params["aux"][f"{kind}_scale"]))
        assert aux_moved == aux_trained, (kind, aux_trained)
        assert scale_moved, kind
    # main weights always train
    assert not np.allclose(np.asarray(new_params["blk"]["0"]["qkv_kernel"][0]),
                           np.asarray(params["blk"]["0"]["qkv_kernel"]))


def test_colearn_attn_ties_stacks():
    """colearn_param='attn' shares attention between modalities
    (mome.py:837-841)."""
    cfg = TOY.replace(colearn_param="attn")
    params = init_mat(cfg, jax.random.PRNGKey(0))
    assert "qkv_kernel" not in params["blk"]["1"]
    img = jnp.zeros((2, 32, 32, 3))
    txt = jnp.zeros((2, 12), jnp.int32)
    outs = mat_apply(cfg, params, [img, txt], feat_out=True)
    assert outs[0].shape == (2, 8)


def test_train_forward_stochastic_depth():
    cfg = TOY.replace(drop_path_rate=0.5)
    params = init_mat(cfg, jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    o1 = mat_apply(cfg, params, [img, None], train=True,
                   rng=jax.random.PRNGKey(2))[0]
    o2 = mat_apply(cfg, params, [img, None], train=True,
                   rng=jax.random.PRNGKey(3))[0]
    assert not np.allclose(o1, o2)
    # eval is deterministic
    e1 = mat_apply(cfg, params, [img, None])[0]
    e2 = mat_apply(cfg, params, [img, None])[0]
    np.testing.assert_allclose(e1, e2)


def test_bf16_train_forward_keeps_dtype():
    """bf16 compute path must not promote the scan carry to f32 (droppath
    scaling regression)."""
    cfg = TOY.replace(compute_dtype="bfloat16", drop_path_rate=0.1)
    params = init_mat(cfg, jax.random.PRNGKey(0))
    img = jnp.zeros((2, 32, 32, 3))
    txt = jnp.zeros((2, 12), jnp.int32)
    outs = mat_apply(cfg, params, [img, txt], feat_out=True, train=True,
                     rng=jax.random.PRNGKey(1))
    assert outs[0].dtype == jnp.float32  # features normalised in f32
    assert np.isfinite(np.asarray(outs[0])).all()


def test_param_counts_vit_small_shape():
    """ViT-small stack (embed 384, depth 12) ~21.6M params per modality
    stack + embeddings, sanity bound."""
    cfg = MATConfig(modalities=("img", None), tasks=("cls", None),
                    num_classes=(100, None), embed_dim=384, depth=12,
                    num_heads=6, use_pallas=False)
    params = init_mat(cfg, jax.random.PRNGKey(0))
    n = param_count(params)
    assert 21_000_000 < n < 23_000_000


def test_naming_roundtrip_paths_exist():
    for cfg in (TOY, IMG_ONLY, TXT_ONLY,
                IMG_ONLY.replace(with_aux=True)):
        params = init_mat(cfg, jax.random.PRNGKey(0))
        for path, name in naming.param_names(cfg):
            naming.get_by_path(params, path)  # must not raise


def test_init_weights_variants():
    """init_weights parity (reference src/utils.py:126-163): kernels get the
    named scheme, their biases zero, embeddings/norms/tokens untouched."""
    from fedcola_tpu.utils.init import init_weights
    params = init_mat(TOY, jax.random.PRNGKey(0))
    word_before = np.asarray(params["emb"]["1"]["word"])

    for it in ("normal", "xavier", "xavier_uniform", "kaiming",
               "truncnorm", "orthogonal"):
        p = init_weights(params, it, 0.02 if it in ("normal", "truncnorm")
                         else 1.0, jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(p["blk"]["0"]["qkv_kernel"]),
                               np.asarray(params["blk"]["0"]["qkv_kernel"])), it
        assert (np.asarray(p["blk"]["0"]["qkv_bias"]) == 0).all(), it
        np.testing.assert_array_equal(np.asarray(p["emb"]["1"]["word"]),
                                      word_before)  # embeddings untouched
        np.testing.assert_array_equal(np.asarray(p["blk"]["0"]["norm1_scale"]),
                                      np.ones_like(p["blk"]["0"]["norm1_scale"]))

    # statistical parity vs torch semantics
    import torch
    D = 64
    big = TOY.replace(embed_dim=D, depth=2, img_size=32, num_heads=2)
    p = init_weights(init_mat(big, jax.random.PRNGKey(0)),
                     "xavier", 1.0, jax.random.PRNGKey(2))
    k = np.asarray(p["blk"]["0"]["fc1_kernel"][0])   # [D, 4D]
    t = torch.empty(4 * D, D)
    torch.nn.init.xavier_normal_(t, gain=1.0)
    assert abs(k.std() - t.numpy().std()) < 0.15 * t.numpy().std()

    import math
    p = init_weights(init_mat(big, jax.random.PRNGKey(0)),
                     "kaiming", 1.0, jax.random.PRNGKey(3))
    k = np.asarray(p["blk"]["0"]["fc1_kernel"][0])
    assert abs(k.std() - math.sqrt(2.0 / D)) < 0.1 * math.sqrt(2.0 / D)

    # orthogonal: columns orthonormal (tall matrix [4D, D] in torch view)
    p = init_weights(init_mat(big, jax.random.PRNGKey(0)),
                     "orthogonal", 1.0, jax.random.PRNGKey(4))
    k = np.asarray(p["blk"]["0"]["fc2_kernel"][0])   # [4D, D] (in, out)
    gram = k.T @ k
    np.testing.assert_allclose(gram, np.eye(D), atol=1e-5)

    # truncnorm: absolute bounds +-2 like torch trunc_normal_
    p = init_weights(init_mat(big, jax.random.PRNGKey(0)),
                     "truncnorm", 1.5, jax.random.PRNGKey(5))
    k = np.asarray(p["blk"]["0"]["qkv_kernel"])
    assert k.min() >= -2.0 - 1e-6 and k.max() <= 2.0 + 1e-6

    with pytest.raises(NotImplementedError):
        init_weights(params, "bogus", 1.0, jax.random.PRNGKey(6))


def test_kernel_policy_droppath_mask_parity():
    """Switching remat_policy to 'kernel' must not change a training
    trajectory: the residual-folded path draws its per-sample DropPath
    scale as bernoulli(key, keep, (B,)) while the XLA path draws
    bernoulli(key, keep, (B, 1, 1)) and selects — same key, same flat
    element count, so the masks (and hence the trained weights) are
    bit-identical across the policy switch."""
    import jax
    import jax.numpy as jnp
    from fedcola_tpu.models.mat import _drop_path

    key = jax.random.PRNGKey(42)
    B, rate = 16, jnp.float32(0.1)   # rate is traced in production
    keep = 1.0 - rate
    flat = jax.random.bernoulli(key, keep, (B,))
    shaped = jax.random.bernoulli(key, keep, (B, 1, 1))
    np.testing.assert_array_equal(np.asarray(flat),
                                  np.asarray(shaped).reshape(B))
    # and the folded arithmetic agrees with _drop_path's select
    f = jnp.asarray(np.random.RandomState(0).randn(B, 5, 8), jnp.float32)
    s = flat.astype(jnp.float32) / keep
    np.testing.assert_allclose(
        np.asarray(s[:, None, None] * f),
        np.asarray(_drop_path(f, rate, key, True)), rtol=1e-6)
