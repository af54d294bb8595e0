"""Fused MLP kernel vs plain XLA: forward + all gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedcola_tpu.ops.fused_mlp import fused_mlp


def _plain(x, w1, b1, w2, b2):
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    return h @ w2 + b2


def test_fused_mlp_fwd_bwd_matches_xla():
    rng = np.random.RandomState(0)
    rows, D, H = 40, 16, 64   # deliberately not a multiple of the row tile
    x = jnp.asarray(rng.randn(rows, D), jnp.float32)
    w1 = jnp.asarray(rng.randn(D, H) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(H, D) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)

    o = fused_mlp(x, w1, b1, w2, b2)
    ref = _plain(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    do = jnp.asarray(rng.randn(rows, D), jnp.float32)
    g = jax.grad(lambda *a: jnp.sum(fused_mlp(*a) * do),
                 argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(lambda *a: jnp.sum(_plain(*a) * do),
                  argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, name in zip(g, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_mlp_vmapped_grad_matches():
    """The client-vmapped path: the custom_vmap rule maps clients onto an
    outer grid dim; vmap(grad(...)) must match plain XLA."""
    rng = np.random.RandomState(1)
    n, rows, D, H = 3, 24, 16, 32
    x = jnp.asarray(rng.randn(n, rows, D), jnp.float32)
    w1 = jnp.asarray(rng.randn(n, D, H) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(n, H) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(n, H, D) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(n, D) * 0.1, jnp.float32)

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(fused_mlp(x, w1, b1, w2, b2) ** 2)

    def loss_plain(x, w1, b1, w2, b2):
        return jnp.sum(_plain(x, w1, b1, w2, b2) ** 2)

    vf = jax.vmap(jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4)))
    vp = jax.vmap(jax.value_and_grad(loss_plain, argnums=(0, 1, 2, 3, 4)))
    lf, gf = vf(x, w1, b1, w2, b2)
    lp, gp = vp(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lp), rtol=1e-5)
    for a, b, name in zip(gf, gp, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5, err_msg=name)


def test_fused_mlp_sublayer_matches_unfused_ln_mlp():
    """LN-folded sublayer golden: fwd + all grads vs LayerNorm->fc1->GELU->
    fc2 composed in plain XLA, under the client vmap."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fedcola_tpu.ops.fused_mlp import fused_mlp_sublayer

    rng = np.random.RandomState(4)
    n, R, D, H = 2, 24, 128, 256
    x = rng.randn(n, R, D).astype(np.float32)
    lns = rng.randn(n, D).astype(np.float32) * 0.1 + 1
    lnb = rng.randn(n, D).astype(np.float32) * 0.1
    w1 = (rng.randn(n, D, H) / np.sqrt(D)).astype(np.float32)
    b1 = rng.randn(n, H).astype(np.float32) * 0.01
    w2 = (rng.randn(n, H, D) / np.sqrt(H)).astype(np.float32)
    b2 = rng.randn(n, D).astype(np.float32) * 0.01

    def ref(x, lns, lnb, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.square(xf - mu).mean(-1, keepdims=True)
        m = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb
        m = m.astype(x.dtype)
        m = jax.nn.gelu(m @ w1 + b1, approximate=False)
        return m @ w2 + b2

    def loss_fused(*a):
        return jnp.sum(jnp.square(jax.vmap(fused_mlp_sublayer)(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(jax.vmap(ref)(*a)))

    args = tuple(map(jnp.asarray, (x, lns, lnb, w1, b1, w2, b2)))
    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(np.asarray(loss_fused(*args)),
                               np.asarray(loss_ref(*args)), rtol=2e-5)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_item_mode_sublayer_matches_rows_mode():
    """fused_mlp_sublayer_items ([B,N,D] grid over items) must agree with
    the rows-mode sublayer on outputs and all gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fedcola_tpu.ops.fused_mlp import (fused_mlp_sublayer,
                                           fused_mlp_sublayer_items)

    rng = np.random.RandomState(6)
    B, N, D, H = 4, 12, 128, 256
    x = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    lns = jnp.asarray(rng.rand(D) + 0.5, jnp.float32)
    lnb = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(D, H) / np.sqrt(D), jnp.float32)
    b1 = jnp.asarray(rng.randn(H) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.randn(H, D) / np.sqrt(H), jnp.float32)
    b2 = jnp.asarray(rng.randn(D) * 0.01, jnp.float32)

    def loss_rows(x, *w):
        return jnp.sum(jnp.square(
            fused_mlp_sublayer(x.reshape(B * N, D), *w)))

    def loss_items(x, *w):
        return jnp.sum(jnp.square(fused_mlp_sublayer_items(x, *w)))

    args = (x, lns, lnb, w1, b1, w2, b2)
    gr = jax.grad(loss_rows, argnums=tuple(range(7)))(*args)
    gi = jax.grad(loss_items, argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(np.asarray(loss_rows(*args)),
                               np.asarray(loss_items(*args)), rtol=2e-5)
    for a, b in zip(gr, gi):
        np.testing.assert_allclose(np.asarray(a).reshape(np.asarray(b).shape),
                                   np.asarray(b), rtol=2e-4, atol=2e-4)


def test_residual_folded_items_sublayer_matches_plain():
    """fused_mlp_residual_sublayer_items: x + s*MLP(LN(x)) on forward and
    every gradient (dx carries the identity branch; ds is zero),
    unbatched and under the client vmap."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fedcola_tpu.ops.fused_mlp import fused_mlp_residual_sublayer_items

    rng = np.random.RandomState(11)
    B, N, D, Hd = 4, 12, 128, 256
    x = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    s = jnp.asarray(rng.choice([0.0, 1.0 / 0.9], size=B), jnp.float32)
    lns = jnp.asarray(rng.rand(D) + 0.5, jnp.float32)
    lnb = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(D, Hd) / np.sqrt(D), jnp.float32)
    b1 = jnp.asarray(rng.randn(Hd) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.randn(Hd, D) / np.sqrt(Hd), jnp.float32)
    b2 = jnp.asarray(rng.randn(D) * 0.01, jnp.float32)

    def plain(x, s, lns, lnb, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb
        h = jax.nn.gelu(h @ w1 + b1, approximate=False)
        return x + s[:, None, None] * (h @ w2 + b2)

    args = (x, s, lns, lnb, w1, b1, w2, b2)
    out = fused_mlp_residual_sublayer_items(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain(*args)),
                               rtol=2e-4, atol=2e-5)

    def loss_f(*a):
        return jnp.sum(jnp.square(fused_mlp_residual_sublayer_items(*a)))

    def loss_p(*a):
        return jnp.sum(jnp.square(plain(*a)))

    gf = jax.grad(loss_f, argnums=tuple(range(8)))(*args)
    gp = jax.grad(loss_p, argnums=(0, 2, 3, 4, 5, 6, 7))(*args)
    np.testing.assert_allclose(np.asarray(gf[1]), 0.0)   # ds: RNG draw
    names = ["dx", "dlns", "dlnb", "dw1", "db1", "dw2", "db2"]
    for a, b, nm in zip((gf[0],) + gf[2:], gp, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=nm)

    # vmapped over a 2-client axis
    vx = jnp.stack([x, x * 1.01])
    vs = jnp.stack([s, s[::-1]])
    vw = tuple(jnp.stack([w, w * 0.99]) for w in (lns, lnb, w1, b1, w2, b2))
    gv = jax.grad(lambda *a: jnp.sum(jnp.square(
        jax.vmap(fused_mlp_residual_sublayer_items)(*a))),
        argnums=(0, 4))(vx, vs, *vw)
    gvr = jax.grad(lambda *a: jnp.sum(jnp.square(jax.vmap(plain)(*a))),
                   argnums=(0, 4))(vx, vs, *vw)
    for a, b, nm in zip(gv, gvr, ["dx", "dw1"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=nm)


@pytest.mark.tpu
def test_residual_folded_mlp_bitexact_vs_external_fold_on_tpu():
    """Real-chip bit-exactness of the residual-folded MLP sublayer vs
    the non-residual kernel + external x + s*f(x) fold (see the
    attention twin for rationale).

    Run with:  FEDCOLA_TEST_TPU=1 python -m pytest tests/ -m tpu
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU (FEDCOLA_TEST_TPU=1)")
    from fedcola_tpu.ops.fused_mlp import (
        fused_mlp_sublayer_items, fused_mlp_residual_sublayer_items)

    Bt, Nt, Dt = 8, 128, 128
    Hd = 4 * Dt
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(Bt, Nt, Dt) * 0.3, jnp.float32)
    s = jnp.asarray(rng.choice([0.0, 1.0 / 0.9], size=Bt), jnp.float32)
    w = (jnp.asarray(rng.rand(Dt) + 0.5, jnp.float32),
         jnp.asarray(rng.randn(Dt) * 0.1, jnp.float32),
         jnp.asarray(rng.randn(Dt, Hd) / np.sqrt(Dt), jnp.float32),
         jnp.asarray(rng.randn(Hd) * 0.01, jnp.float32),
         jnp.asarray(rng.randn(Hd, Dt) / np.sqrt(Hd), jnp.float32),
         jnp.asarray(rng.randn(Dt) * 0.01, jnp.float32))
    do = jnp.asarray(rng.randn(Bt, Nt, Dt), jnp.float32)

    g0 = jax.grad(
        lambda x, *w: jnp.sum(
            (x + s[:, None, None] * fused_mlp_sublayer_items(x, *w)) * do),
        argnums=(0, 3, 5, 6))(x, *w)
    g1 = jax.grad(
        lambda x, *w: jnp.sum(
            fused_mlp_residual_sublayer_items(x, s, *w) * do),
        argnums=(0, 3, 5, 6))(x, *w)
    np.testing.assert_array_equal(
        np.asarray(x + s[:, None, None] * fused_mlp_sublayer_items(x, *w)),
        np.asarray(fused_mlp_residual_sublayer_items(x, s, *w)))
    for a, b, nm in zip(g0, g1, ["dx", "dw1", "dw2", "db2"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=nm)


@pytest.mark.tpu
def test_wide_width_fused_mlp_on_tpu():
    """ViT-base widths (D=768) through the fused MLP sublayer on the real
    chip: these shapes need the raised per-kernel VMEM limit
    (ops/common.wide_compiler_params — the f32 dW accumulators exceed
    Mosaic's ~16 MB default check) and were gated to the XLA fallback
    before round 3.  Checks fwd + all grads vs plain math at bf16
    tolerance.

    Run with:  FEDCOLA_TEST_TPU=1 python -m pytest tests/ -m tpu
    """
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU (FEDCOLA_TEST_TPU=1)")
    from fedcola_tpu.ops.fused_mlp import fused_mlp_sublayer_items

    B, N, D = 4, 197, 768
    Hd = 4 * D
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(B, N, D) * 0.3, dt)
    lns = jnp.asarray(rng.rand(D) + 0.5, jnp.float32)
    lnb = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(D, Hd) / np.sqrt(D), dt)
    b1 = jnp.asarray(rng.randn(Hd) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.randn(Hd, D) / np.sqrt(Hd), dt)
    b2 = jnp.asarray(rng.randn(D) * 0.01, jnp.float32)
    do = jnp.asarray(rng.randn(B, N, D), dt)

    def plain(x, lns, lnb, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb).astype(x.dtype)
        pre = jnp.dot(h, w1, preferred_element_type=jnp.float32) + b1
        g = jax.nn.gelu(pre, approximate=False).astype(x.dtype)
        return jnp.dot(g, w2, preferred_element_type=jnp.float32) + b2

    args = (x, lns, lnb, w1, b1, w2, b2)
    of = np.asarray(fused_mlp_sublayer_items(*args), np.float32)
    op = np.asarray(plain(*args), np.float32)
    np.testing.assert_allclose(of, op, rtol=3e-2, atol=3e-2)

    gf = jax.grad(lambda *a: jnp.sum(
        fused_mlp_sublayer_items(*a).astype(jnp.float32)
        * do.astype(jnp.float32)), argnums=(0, 3, 5))(*args)
    gp = jax.grad(lambda *a: jnp.sum(
        plain(*a) * do.astype(jnp.float32)), argnums=(0, 3, 5))(*args)
    for a, b, nm in zip(gf, gp, ["dx", "dw1", "dw2"]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-3)
        assert rel < 3e-2, f"{nm}: max rel diff {rel:.4f} at D=768"

    # the residual-folded variant is the PRODUCTION wide-width training
    # path ('kernel' remat policy folds x + s*mlp(LN(x)) in-kernel) —
    # verify it too, against the plain math with the external fold
    from fedcola_tpu.ops.fused_mlp import fused_mlp_residual_sublayer_items
    s = jnp.asarray(rng.choice([0.0, 1.0 / 0.9], size=B), jnp.float32)

    def plain_res(x, s, *w):
        return x.astype(jnp.float32) + s[:, None, None] * plain(x, *w)

    rargs = (x, s) + args[1:]
    orf = np.asarray(fused_mlp_residual_sublayer_items(*rargs), np.float32)
    orp = np.asarray(plain_res(*rargs), np.float32)
    rel = np.abs(orf - orp).max() / max(np.abs(orp).max(), 1e-3)
    assert rel < 3e-2, f"residual fwd: max rel diff {rel:.4f} at D=768"
    grf = jax.grad(lambda *a: jnp.sum(
        fused_mlp_residual_sublayer_items(*a).astype(jnp.float32)
        * do.astype(jnp.float32)), argnums=(0, 4, 6))(*rargs)
    grp = jax.grad(lambda *a: jnp.sum(
        plain_res(*a) * do.astype(jnp.float32)), argnums=(0, 4, 6))(*rargs)
    for a, b, nm in zip(grf, grp, ["dx", "dw1", "dw2"]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-3)
        assert rel < 3e-2, f"residual {nm}: max rel diff {rel:.4f} at D=768"
