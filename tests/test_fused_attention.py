"""Fused attention sublayer kernel vs plain reference math:
forward + every gradient, unbatched and client-vmapped."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedcola_tpu.ops.fused_attention import make_fused_attention_sublayer

H, N, D = 2, 12, 16
hd = D // H


def _plain(x, lns, lnb, wqkv, bqkv, wproj, bproj):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb
    qkv = h @ wqkv + bqkv
    B = x.shape[0]
    qkv = qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
    return o @ wproj + bproj


def _args(seed=0, B=3):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(B, N, D), jnp.float32),
            jnp.asarray(rng.rand(D) + 0.5, jnp.float32),
            jnp.asarray(rng.randn(D) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(D, 3 * D) * 0.2, jnp.float32),
            jnp.asarray(rng.randn(3 * D) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(D, D) * 0.2, jnp.float32),
            jnp.asarray(rng.randn(D) * 0.1, jnp.float32))


def test_fused_attention_sublayer_fwd_bwd():
    fn = make_fused_attention_sublayer(H)
    args = _args(B=4)   # even B exercises the 2-items-per-program path
    out = fn(*args)
    ref = _plain(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    do = jnp.asarray(np.random.RandomState(9).randn(4, N, D), jnp.float32)
    g = jax.grad(lambda *a: jnp.sum(fn(*a) * do),
                 argnums=tuple(range(7)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(_plain(*a) * do),
                  argnums=tuple(range(7)))(*args)
    names = ["dx", "dlns", "dlnb", "dwqkv", "dbqkv", "dwproj", "dbproj"]
    for a, b, nm in zip(g, gr, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=nm)


def test_fused_attention_sublayer_vmapped():
    fn = make_fused_attention_sublayer(H)
    n = 2
    stacked = [jnp.stack([a * (1 + 0.1 * i) for i in range(n)])
               for a in _args(seed=1)]

    def loss_f(*a):
        return jnp.sum(fn(*a) ** 2)

    def loss_p(*a):
        return jnp.sum(_plain(*a) ** 2)

    lf, gf = jax.vmap(jax.value_and_grad(loss_f, argnums=(0, 3, 5)))(*stacked)
    lp, gp = jax.vmap(jax.value_and_grad(loss_p, argnums=(0, 3, 5)))(*stacked)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lp), rtol=1e-4)
    for a, b, nm in zip(gf, gp, ["dx", "dwqkv", "dwproj"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=nm)


def test_save_residuals_grads_match_recompute_path():
    """The residual-saving backward (p+cat stored by the forward) must
    produce the same gradients as the recompute backward, unbatched and
    under the client vmap."""
    do = jnp.asarray(np.random.RandomState(9).randn(3, N, D), jnp.float32)
    args = _args(3)
    f_rec = make_fused_attention_sublayer(H, save_residuals=False)
    f_sav = make_fused_attention_sublayer(H, save_residuals=True)
    g_rec = jax.grad(lambda *a: jnp.sum(f_rec(*a) * do),
                     argnums=tuple(range(7)))(*args)
    g_sav = jax.grad(lambda *a: jnp.sum(f_sav(*a) * do),
                     argnums=tuple(range(7)))(*args)
    for a, b in zip(g_rec, g_sav):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    # vmapped over a 2-client axis
    vargs = tuple(jnp.stack([a, a * 1.01]) for a in args)
    vdo = jnp.stack([do, do * 0.5])
    gv_rec = jax.grad(lambda *a: jnp.sum(jax.vmap(f_rec)(*a) * vdo),
                      argnums=(0, 3, 5))(*vargs)
    gv_sav = jax.grad(lambda *a: jnp.sum(jax.vmap(f_sav)(*a) * vdo),
                      argnums=(0, 3, 5))(*vargs)
    for a, b in zip(gv_rec, gv_sav):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.tpu
def test_save_residuals_bf16_grad_tolerance_on_tpu():
    """'kernel' remat policy numerics on real hardware: the residual-saving
    backward reads softmax probs + head concat saved in bf16 — this
    quantization must stay within bf16-roundoff of the recompute backward
    at the production compute dtype (ADVICE r2: the save-vs-recompute
    equivalence was only ever tested in f32 on CPU).

    Run with:  FEDCOLA_TEST_TPU=1 python -m pytest tests/ -m tpu
    """
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU (FEDCOLA_TEST_TPU=1)")
    Ht, Nt, Dt = 6, 197, 384          # production ViT-small shape
    rng = np.random.RandomState(0)
    args = (jnp.asarray(rng.randn(2, Nt, Dt), jnp.bfloat16),
            jnp.asarray(rng.rand(Dt) + 0.5, jnp.float32),
            jnp.asarray(rng.randn(Dt) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(Dt, 3 * Dt) * 0.05, jnp.bfloat16),
            jnp.asarray(rng.randn(3 * Dt) * 0.1, jnp.bfloat16),
            jnp.asarray(rng.randn(Dt, Dt) * 0.05, jnp.bfloat16),
            jnp.asarray(rng.randn(Dt) * 0.1, jnp.bfloat16))
    fn_save = make_fused_attention_sublayer(Ht, save_residuals=True)
    fn_rec = make_fused_attention_sublayer(Ht, save_residuals=False)
    do = jnp.asarray(np.random.RandomState(9).randn(2, Nt, Dt), jnp.bfloat16)

    def g(fn):
        return jax.grad(
            lambda *a: jnp.sum(fn(*a).astype(jnp.float32) * do.astype(jnp.float32)),
            argnums=tuple(range(7)))(*args)

    gs, gr = g(fn_save), g(fn_rec)
    np.testing.assert_allclose(
        np.asarray(fn_save(*args), np.float32),
        np.asarray(fn_rec(*args), np.float32), rtol=2e-2, atol=2e-2)
    for a, b, nm in zip(gs, gr, ["dx", "dlns", "dlnb", "dwqkv", "dbqkv",
                                 "dwproj", "dbproj"]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.maximum(np.abs(b).max(), 1e-3)
        rel = np.abs(a - b).max() / denom
        assert rel < 2e-2, f"{nm}: max rel diff {rel:.4f} exceeds bf16 tolerance"


def test_residual_folded_sublayer_matches_plain():
    """Residual-folded variant: fn(x, s, ...) == x + s*attn(x) on forward
    and every gradient (dx carries the identity branch; ds is zero),
    unbatched and under the client vmap."""
    from fedcola_tpu.ops.fused_attention import \
        make_fused_attention_residual_sublayer

    B = 4
    args = _args(seed=5, B=B)
    s = jnp.asarray(np.random.RandomState(7).choice(
        [0.0, 1.0 / 0.9], size=B), jnp.float32)   # realistic DropPath draws
    fn = make_fused_attention_residual_sublayer(H)

    def plain_res(x, s, *w):
        return x + s[:, None, None] * _plain(x, *w)

    out = fn(args[0], s, *args[1:])
    ref = plain_res(args[0], s, *args[1:])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    do = jnp.asarray(np.random.RandomState(9).randn(B, N, D), jnp.float32)
    g = jax.grad(lambda x, s, *w: jnp.sum(fn(x, s, *w) * do),
                 argnums=tuple(range(8)))(args[0], s, *args[1:])
    gr = jax.grad(lambda x, s, *w: jnp.sum(plain_res(x, s, *w) * do),
                  argnums=(0, 2, 3, 4, 5, 6, 7))(args[0], s, *args[1:])
    names = ["dx", "dlns", "dlnb", "dwqkv", "dbqkv", "dwproj", "dbproj"]
    np.testing.assert_allclose(np.asarray(g[1]), 0.0)   # ds: RNG draw
    for a, b, nm in zip((g[0],) + g[2:], gr, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=nm)

    # vmapped over a 2-client axis (the production path: clients mesh axis)
    vargs = tuple(jnp.stack([a, a * 1.01]) for a in args)
    vs = jnp.stack([s, s[::-1]])
    vdo = jnp.stack([do, do * 0.5])
    gv = jax.grad(
        lambda x, s, *w: jnp.sum(jax.vmap(fn)(x, s, *w) * vdo),
        argnums=(0, 2, 4))(vargs[0], vs, *vargs[1:])
    gvr = jax.grad(
        lambda x, s, *w: jnp.sum(jax.vmap(plain_res)(x, s, *w) * vdo),
        argnums=(0, 2, 4))(vargs[0], vs, *vargs[1:])
    for a, b, nm in zip(gv, gvr, ["dx", "dlns", "dwqkv"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=nm)


@pytest.mark.tpu
def test_residual_folded_bitexact_vs_external_fold_on_tpu():
    """Real-chip equivalence for the production training path: the
    residual-folded kernels (residual join + DropPath scale in SMEM,
    computed in-kernel) must match the non-residual kernels plus an
    external ``x + s*f(x)`` fold BIT-EXACTLY — both run the same dots in
    the same order; only where the join happens differs.  Guards the
    SMEM absolute-indexing path, which CPU interpret mode does not
    exercise faithfully (Mosaic block-shape rules differ).

    Run with:  FEDCOLA_TEST_TPU=1 python -m pytest tests/ -m tpu
    """
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU (FEDCOLA_TEST_TPU=1)")
    from fedcola_tpu.ops.fused_attention import \
        make_fused_attention_residual_sublayer

    Bt, Nt, Dt, Ht = 8, 128, 128, 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(Bt, Nt, Dt) * 0.3, jnp.float32)
    s = jnp.asarray(rng.choice([0.0, 1.0 / 0.9], size=Bt), jnp.float32)
    w = (jnp.asarray(rng.rand(Dt) + 0.5, jnp.float32),
         jnp.asarray(rng.randn(Dt) * 0.1, jnp.float32),
         jnp.asarray(rng.randn(Dt, 3 * Dt) / np.sqrt(Dt), jnp.float32),
         jnp.asarray(rng.randn(3 * Dt) * 0.01, jnp.float32),
         jnp.asarray(rng.randn(Dt, Dt) / np.sqrt(Dt), jnp.float32),
         jnp.asarray(rng.randn(Dt) * 0.01, jnp.float32))
    do = jnp.asarray(rng.randn(Bt, Nt, Dt), jnp.float32)

    base = make_fused_attention_sublayer(Ht, save_residuals=True)
    res = make_fused_attention_residual_sublayer(Ht)
    g0 = jax.grad(
        lambda x, *w: jnp.sum((x + s[:, None, None] * base(x, *w)) * do),
        argnums=(0, 3, 5, 6))(x, *w)
    g1 = jax.grad(lambda x, *w: jnp.sum(res(x, s, *w) * do),
                  argnums=(0, 3, 5, 6))(x, *w)
    np.testing.assert_array_equal(
        np.asarray(x + s[:, None, None] * base(x, *w)),
        np.asarray(res(x, s, *w)))
    for a, b, nm in zip(g0, g1, ["dx", "dwqkv", "dwproj", "dbproj"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


@pytest.mark.tpu
def test_wide_width_fused_attention_on_tpu():
    """ViT-base widths (D=768, H=12) through both attention sublayer
    variants on the real chip: the save-residuals forward/backward at
    these shapes need the raised per-kernel VMEM limit
    (ops/common.wide_compiler_params) and were gated to the XLA fallback
    before round 3.  Checks fwd + grads vs plain math at bf16 tolerance.

    Run with:  FEDCOLA_TEST_TPU=1 python -m pytest tests/ -m tpu
    """
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU (FEDCOLA_TEST_TPU=1)")
    Ht, Nt, Dt = 12, 197, 768
    hdt = Dt // Ht
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    args = (jnp.asarray(rng.randn(4, Nt, Dt) * 0.3, dt),
            jnp.asarray(rng.rand(Dt) + 0.5, jnp.float32),
            jnp.asarray(rng.randn(Dt) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(Dt, 3 * Dt) / np.sqrt(Dt), dt),
            jnp.asarray(rng.randn(3 * Dt) * 0.01, dt),
            jnp.asarray(rng.randn(Dt, Dt) / np.sqrt(Dt), dt),
            jnp.asarray(rng.randn(Dt) * 0.01, dt))
    do = jnp.asarray(np.random.RandomState(9).randn(4, Nt, Dt), dt)

    def plain(x, lns, lnb, wqkv, bqkv, wproj, bproj):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb).astype(x.dtype)
        qkv = jnp.dot(h, wqkv, preferred_element_type=jnp.float32) \
            + bqkv.astype(jnp.float32)
        B = x.shape[0]
        qkv = qkv.reshape(B, Nt, 3, Ht, hdt).transpose(2, 0, 3, 1, 4)
        q, k, v = (qkv[0] * hdt ** -0.5).astype(x.dtype), \
            qkv[1].astype(x.dtype), qkv[2].astype(x.dtype)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(B, Nt, Dt).astype(x.dtype)
        return jnp.dot(o, wproj, preferred_element_type=jnp.float32) \
            + bproj.astype(jnp.float32)

    for save in (False, True):
        fn = make_fused_attention_sublayer(Ht, save_residuals=save)
        of = np.asarray(fn(*args), np.float32)
        op = np.asarray(plain(*args), np.float32)
        rel = np.abs(of - op).max() / max(np.abs(op).max(), 1e-3)
        assert rel < 3e-2, f"fwd(save={save}): max rel diff {rel:.4f}"
        gf = jax.grad(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)
                                         * do.astype(jnp.float32)),
                      argnums=(0, 3, 5))(*args)
        gp = jax.grad(lambda *a: jnp.sum(plain(*a)
                                         * do.astype(jnp.float32)),
                      argnums=(0, 3, 5))(*args)
        for a, b, nm in zip(gf, gp, ["dx", "dwqkv", "dwproj"]):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-3)
            assert rel < 3e-2, \
                f"{nm}(save={save}): max rel diff {rel:.4f} at D=768"

    # the residual-folded save-residuals variant is the PRODUCTION
    # wide-width training path ('kernel' remat policy) — verify it too
    from fedcola_tpu.ops.fused_attention import \
        make_fused_attention_residual_sublayer
    s = jnp.asarray(rng.choice([0.0, 1.0 / 0.9], size=4), jnp.float32)
    fnr = make_fused_attention_residual_sublayer(Ht)

    def plain_res(x, s, *w):
        return x.astype(jnp.float32) + s[:, None, None] * plain(x, *w)

    rargs = (args[0], s) + args[1:]
    orf = np.asarray(fnr(*rargs), np.float32)
    orp = np.asarray(plain_res(*rargs), np.float32)
    rel = np.abs(orf - orp).max() / max(np.abs(orp).max(), 1e-3)
    assert rel < 3e-2, f"residual fwd: max rel diff {rel:.4f} at D=768"
    grf = jax.grad(lambda *a: jnp.sum(fnr(*a).astype(jnp.float32)
                                      * do.astype(jnp.float32)),
                   argnums=(0, 4, 6))(*rargs)
    grp = jax.grad(lambda *a: jnp.sum(plain_res(*a)
                                      * do.astype(jnp.float32)),
                   argnums=(0, 4, 6))(*rargs)
    for a, b, nm in zip(grf, grp, ["dx", "dwqkv", "dwproj"]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-3)
        assert rel < 3e-2, \
            f"residual {nm}: max rel diff {rel:.4f} at D=768"
