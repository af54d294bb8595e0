"""Op-level numerics: flash attention vs XLA reference, losses vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedcola_tpu.ops.attention import _attention_xla
from fedcola_tpu.ops import losses


def test_flash_attention_matches_xla_fwd_bwd():
    from fedcola_tpu.ops.flash_attention import flash_attention
    B, H, N, hd = 2, 2, 24, 16
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(k1, (B, H, N, hd))
    k = jax.random.normal(k2, (B, H, N, hd))
    v = jax.random.normal(k3, (B, H, N, hd))
    scale = hd ** -0.5

    o_ref = _attention_xla(q, k, v, scale)
    o = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)

    do = jax.random.normal(k4, (B, H, N, hd))
    gref = jax.grad(lambda q_, k_, v_: jnp.sum(
        _attention_xla(q_, k_, v_, scale) * do), argnums=(0, 1, 2))(q, k, v)
    gfa = jax.grad(lambda q_, k_, v_: jnp.sum(
        flash_attention(q_, k_, v_, scale) * do), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gfa, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_flash_attention_oversized_pair_falls_back():
    """Shapes whose single (batch, head) working set exceeds the VMEM
    budget must route to the XLA path (pick_group returns 0) instead of
    launching a kernel Mosaic cannot allocate."""
    from fedcola_tpu.ops.flash_attention import (MAX_FUSED_SEQ,
                                                _pick_group,
                                                flash_attention)
    # bwd working set at N=1024, hd=64 is ~14.4 MB > the 10 MB budget
    assert _pick_group(8, 1024, 64, n_bufs=7) == 0
    assert _pick_group(8, 197, 64, n_bufs=7) >= 1
    assert 1024 <= MAX_FUSED_SEQ  # the gate below, not the seq cap, trips
    B, H, N, hd = 1, 1, 1024, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, H, N, hd)) for kk in ks)
    scale = hd ** -0.5
    o = flash_attention(q, k, v, scale)            # fwd may still fuse
    g = jax.grad(lambda q_: jnp.sum(
        flash_attention(q_, k, v, scale)))(q)      # bwd takes the fallback
    assert np.isfinite(np.asarray(o)).all()
    assert np.isfinite(np.asarray(g)).all()


def test_cross_entropy_matches_torch():
    import torch
    logits = np.random.RandomState(0).randn(16, 7).astype(np.float32)
    y = np.random.RandomState(1).randint(0, 7, 16)
    ours = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(y)))
    ref = float(torch.nn.CrossEntropyLoss()(torch.tensor(logits),
                                            torch.tensor(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_clip_contrastive_matches_manual():
    """Fixed temperature 1/0.07 (per-batch re-instantiation, SURVEY/§2.4)."""
    import torch
    rng = np.random.RandomState(0)
    a = rng.randn(8, 16).astype(np.float32)
    b = rng.randn(8, 16).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    ours = float(losses.clip_contrastive(jnp.asarray(a), jnp.asarray(b)))
    logits = torch.tensor(a @ b.T) * float(np.exp(np.log(1 / 0.07)))
    labels = torch.arange(8)
    ref = 0.5 * (torch.nn.functional.cross_entropy(logits, labels)
                 + torch.nn.functional.cross_entropy(logits.t(), labels))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_contrastive_masked_rows():
    rng = np.random.RandomState(0)
    a = rng.randn(8, 16).astype(np.float32)
    b = rng.randn(8, 16).astype(np.float32)
    valid = np.array([True] * 6 + [False] * 2)
    full = float(losses.clip_contrastive(jnp.asarray(a[:6]), jnp.asarray(b[:6])))
    masked = float(losses.clip_contrastive(jnp.asarray(a), jnp.asarray(b),
                                           jnp.asarray(valid)))
    np.testing.assert_allclose(masked, full, rtol=1e-5)


def test_optimizer_matches_torch_adamw():
    import torch
    from fedcola_tpu.parallel.optim import (OptimizerSpec, init_opt_state,
                                            opt_update)
    rng = np.random.RandomState(0)
    w0 = rng.randn(5, 4).astype(np.float32)
    spec = OptimizerSpec(name="AdamW", weight_decay=0.01)

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.AdamW([tw], lr=1e-3, weight_decay=0.01)
    params = {"w": jnp.asarray(w0)}
    state = init_opt_state(spec, params)
    for step in range(3):
        g = rng.randn(5, 4).astype(np.float32)
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()
        params, state = opt_update(spec, params, {"w": jnp.asarray(g)},
                                   state, 1e-3)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_optimizer_matches_torch_sgd_momentum():
    import torch
    from fedcola_tpu.parallel.optim import (OptimizerSpec, init_opt_state,
                                            opt_update)
    rng = np.random.RandomState(0)
    w0 = rng.randn(6).astype(np.float32)
    spec = OptimizerSpec(name="SGD", momentum=0.9, weight_decay=0.001)
    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=0.001)
    params = {"w": jnp.asarray(w0)}
    state = init_opt_state(spec, params)
    for step in range(3):
        g = rng.randn(6).astype(np.float32)
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()
        params, state = opt_update(spec, params, {"w": jnp.asarray(g)},
                                   state, 0.1)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_step_valid_mask_is_exact_noop():
    from fedcola_tpu.parallel.optim import (OptimizerSpec, init_opt_state,
                                            opt_update)
    spec = OptimizerSpec(name="AdamW")
    params = {"w": jnp.ones((3,))}
    state = init_opt_state(spec, params)
    g = {"w": jnp.ones((3,))}
    p2, s2 = opt_update(spec, params, g, state, 1e-2,
                        step_valid=jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.ones(3))
    assert int(s2["t"]["w"]) == 0


def test_grad_clip_matches_torch():
    import torch
    from fedcola_tpu.parallel.optim import clip_global_norm
    rng = np.random.RandomState(3)
    g1 = rng.randn(4, 3).astype(np.float32) * 10
    g2 = rng.randn(5).astype(np.float32) * 10
    t1 = torch.nn.Parameter(torch.zeros(4, 3)); t1.grad = torch.tensor(g1)
    t2 = torch.nn.Parameter(torch.zeros(5)); t2.grad = torch.tensor(g2)
    torch.nn.utils.clip_grad_norm_([t1, t2], 1.0)
    ours = clip_global_norm({"a": jnp.asarray(g1), "b": jnp.asarray(g2)}, 1.0)
    np.testing.assert_allclose(np.asarray(ours["a"]), t1.grad.numpy(),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["b"]), t2.grad.numpy(),
                               rtol=1e-4)


def test_seq2seq_ce_masks_padded_rows():
    """Padded partial-batch rows must not bias the token mean
    (drop_last=False parity: padding duplicates real rows), and the
    reference's special-token remap (Seq2SeqLoss, src/utils.py:303-315:
    targets in [0,1,2,3] -> ignore_index=-1) is applied by default."""
    import torch
    from fedcola_tpu.ops.losses import seq2seq_ce
    rng = np.random.RandomState(0)
    B, L, V = 4, 5, 7
    logits = rng.randn(B, L, V).astype(np.float32)
    targets = rng.randint(0, V, (B, L))      # ids 0-3 are special tokens
    targets[1, 3:] = -1                      # some pre-ignored tokens
    valid = np.array([True, True, True, False])
    ours = float(seq2seq_ce(jnp.asarray(logits), jnp.asarray(targets),
                            jnp.asarray(valid)))
    # the reference Seq2SeqLoss forward, verbatim semantics
    t = torch.tensor(targets[:3]).reshape(-1).clone()
    t[torch.isin(t, torch.tensor([0, 1, 2, 3]))] = -1
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits[:3]).reshape(-1, V), t, ignore_index=-1)
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)
    # all-special-token batch returns 0.0 (reference's zero fallback)
    all_special = np.zeros((B, L), dtype=np.int64)
    z = float(seq2seq_ce(jnp.asarray(logits), jnp.asarray(all_special)))
    assert z == 0.0


def test_seg_loss_dispatchable_and_masked():
    """SegLoss is reachable from the training dispatch (check_args accepts
    it) and the valid mask drops padded rows from both CE and Dice terms."""
    from fedcola_tpu.ops.losses import seg_loss
    from fedcola_tpu.parallel.client_update import _cls_criterion
    fn = _cls_criterion("SegLoss")
    rng = np.random.RandomState(1)
    logits = rng.randn(4, 6).astype(np.float32)
    y = rng.randint(0, 6, (4,))
    valid = np.array([True, True, True, False])
    masked = float(fn(jnp.asarray(logits), jnp.asarray(y),
                      jnp.asarray(valid)))
    unpadded = float(seg_loss(jnp.asarray(logits[:3]), jnp.asarray(y[:3])))
    np.testing.assert_allclose(masked, unpadded, rtol=1e-5)


def test_bf16_moment_storage_tracks_f32_updates():
    """moment_dtype='bfloat16' halves optimizer-state HBM; per-step math is
    still f32, so a few steps stay close to the f32-moment reference and
    the stored moments keep the requested dtype."""
    from fedcola_tpu.parallel.optim import (OptimizerSpec, init_opt_state,
                                            opt_update)
    rng = np.random.RandomState(5)
    w0 = rng.randn(8, 8).astype(np.float32)
    ref_spec = OptimizerSpec(name="AdamW", weight_decay=0.01)
    bf_spec = OptimizerSpec(name="AdamW", weight_decay=0.01,
                            moment_dtype="bfloat16")
    p_ref = {"w": jnp.asarray(w0)}
    p_bf = {"w": jnp.asarray(w0)}
    s_ref = init_opt_state(ref_spec, p_ref)
    s_bf = init_opt_state(bf_spec, p_bf)
    assert s_bf["m"]["w"].dtype == jnp.bfloat16
    for _ in range(4):
        g = {"w": jnp.asarray(rng.randn(8, 8).astype(np.float32))}
        p_ref, s_ref = opt_update(ref_spec, p_ref, g, s_ref, 1e-3)
        p_bf, s_bf = opt_update(bf_spec, p_bf, g, s_bf, 1e-3)
    assert s_bf["m"]["w"].dtype == jnp.bfloat16
    assert s_bf["v"]["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(p_bf["w"]), np.asarray(p_ref["w"]),
                               rtol=0, atol=2e-4)


def test_fedprox_term_per_layer_and_representation_invariant():
    """The proximal term sums one L2 norm PER torch named parameter —
    i.e. per layer slice of the depth-stacked blk/aux leaves
    (fedproxclient.py:64-67), not one norm of the whole stack — and is
    identical whether the blk leaves arrive stacked or as perlayer_io
    tuples."""
    rng = np.random.RandomState(0)
    depth = 3
    stacked = {
        "emb": {"0": {"w": jnp.asarray(rng.randn(4, 5), jnp.float32)}},
        "blk": {"0": {"k": jnp.asarray(rng.randn(depth, 2, 3), jnp.float32),
                      "b": jnp.asarray(rng.randn(depth, 3), jnp.float32)}},
        "aux": {"k_aux": jnp.asarray(rng.randn(depth, 2, 3), jnp.float32),
                "k_scale": jnp.asarray(rng.randn(depth), jnp.float32)},
        "norm": {"scale": jnp.asarray(rng.randn(6), jnp.float32)},
    }
    gparams = jax.tree_util.tree_map(
        lambda x: x + jnp.asarray(rng.randn(*x.shape), jnp.float32) * 0.1,
        stacked)

    def norm(d):
        return float(np.sqrt(np.sum(np.asarray(d, np.float64) ** 2)))

    expect = norm(stacked["emb"]["0"]["w"] - gparams["emb"]["0"]["w"]) \
        + norm(stacked["norm"]["scale"] - gparams["norm"]["scale"])
    for l in range(depth):
        for key in ("k", "b"):
            expect += norm(stacked["blk"]["0"][key][l]
                           - gparams["blk"]["0"][key][l])
        for key in ("k_aux", "k_scale"):
            expect += norm(stacked["aux"][key][l] - gparams["aux"][key][l])
    expect *= 0.05 * 0.5

    got = float(losses.fedprox_term(stacked, gparams, 0.05))
    np.testing.assert_allclose(got, expect, rtol=1e-6)

    def to_perlayer(t):
        out = dict(t)
        out["blk"] = {s: {k: tuple(v[l] for l in range(depth))
                          for k, v in slot.items()}
                      for s, slot in t["blk"].items()}
        out["aux"] = {k: tuple(v[l] for l in range(depth))
                      for k, v in t["aux"].items()}
        return out

    got_pl = float(losses.fedprox_term(to_perlayer(stacked),
                                       to_perlayer(gparams), 0.05))
    np.testing.assert_allclose(got_pl, got, rtol=1e-7)

    # zero distance contributes exactly 0 (torch's norm-at-0 subgradient)
    assert float(losses.fedprox_term(stacked, stacked, 0.05)) == 0.0
