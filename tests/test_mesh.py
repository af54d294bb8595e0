"""Production mesh layout: results must be invariant to the device layout.

The same seeded round must produce (numerically) the same global models and
eval metrics on one device, an 8-device 1-D ``clients`` mesh, and a 2-D
``(clients, data)`` mesh — sharding is an execution detail, not semantics.
SURVEY.md §2.8 P1/P3 (reference equivalents: client thread pool +
DataParallel).
"""

import numpy as np
import pytest

import jax

from fedcola_tpu.config import ExperimentConfig, check_args
from fedcola_tpu.data.loaders import load_federated_data
from fedcola_tpu.federation.server import create_server
from fedcola_tpu.parallel.mesh import MeshPlan


def _run(mesh_shape, mesh_axes=None, **kw):
    base = dict(
        exp_name="mesh", seed=11, multi_task=True,
        datasets=["CIFAR100", "AG_NEWS", "AG_NEWS"],
        modalities=["img", "txt", "txt"],
        Ks=[2, 2], Cs=[1.0, 1.0], R=1, E=1, B=8,
        eval_batch_size=16, optimizer="AdamW", lr=1e-3,
        criterion="CrossEntropyLoss", eval_type="global",
        model_name="mome_test_patch16_32", seq_len=12,
        split_type="iid", synthetic_data=True, use_pallas=False,
        compute_dtype="float32", equal_sampled=True,
        train_chunk_steps=4, resize=32, vocab_size=60,
        shared_param="attn", share_scope="modality",
        mesh_shape=mesh_shape, mesh_axes=mesh_axes or ["clients"],
    )
    base.update(kw)
    cfg = check_args(ExperimentConfig(**base))
    data = load_federated_data(cfg, np.random.RandomState(cfg.seed))
    server = create_server(cfg, data)
    server.round = 1
    assert server.update()
    server.evaluate([])
    return server


def _flat(server):
    leaves = {}
    for ds, p in server.global_params.items():
        for i, leaf in enumerate(jax.tree_util.tree_leaves(p)):
            leaves[f"{ds}/{i}"] = np.asarray(leaf)
    return leaves


def test_layout_invariance_1dev_vs_2d_mesh():
    """SGD keeps the comparison strict: reduction reassociation across
    layouts perturbs gradients by ~1e-7, which AdamW's first-step
    g/(sqrt(g^2)+eps) normaliser would amplify to +-lr sign flips on
    near-zero bias gradients (measured: everything but qkv_bias agrees to
    2e-7 under AdamW too)."""
    s1 = _run([1], optimizer="SGD", lr=1e-2)
    assert s1.mesh is None
    s2d = _run([4, 2], ["clients", "data"], optimizer="SGD", lr=1e-2)
    assert dict(s2d.mesh.shape) == {"clients": 4, "data": 2}
    f1, f2 = _flat(s1), _flat(s2d)
    for k in f1:
        np.testing.assert_allclose(f1[k], f2[k], rtol=2e-5, atol=2e-6,
                                   err_msg=k)
    for ds in ("CIFAR100", "AG_NEWS"):
        r1 = s1.results[1][f"server_evaluated_{ds}"]
        r2 = s2d.results[1][f"server_evaluated_{ds}"]
        assert abs(r1["loss"] - r2["loss"]) < 1e-4
        assert abs(r1["metrics"]["acc1"] - r2["metrics"]["acc1"]) < 1e-6


def test_1d_clients_mesh_matches_too():
    s8 = _run([8], ["clients"], optimizer="SGD", lr=1e-2)
    s1 = _run([1], optimizer="SGD", lr=1e-2)
    f1, f8 = _flat(s1), _flat(s8)
    for k in f1:
        np.testing.assert_allclose(f1[k], f8[k], rtol=2e-5, atol=2e-6,
                                   err_msg=k)


def test_meshplan_validation():
    with pytest.raises(ValueError, match="include 'clients'"):
        MeshPlan.build([8], ["data"])
    with pytest.raises(ValueError, match="does not match"):
        MeshPlan.build([4, 2], ["clients", "data", "extra"])
    with pytest.raises(ValueError, match="devices"):
        MeshPlan.build([64], ["clients"])
    # default axes fill in for multi-dim shapes
    p = MeshPlan.build([4, 2])
    assert dict(p.mesh.shape) == {"clients": 4, "data": 2}
    assert MeshPlan.build([1]).mesh is None


def test_shard_chunk_layout():
    plan = MeshPlan.build([4, 2], ["clients", "data"])
    chunk = {
        "x": np.zeros((4, 3, 8, 16, 16, 3), np.uint8),
        "y": np.zeros((4, 3, 8), np.int32),
        "odd": np.zeros((4, 3, 7), np.int32),      # B=7 not divisible by 2
        "step_valid": np.ones((4, 3), bool),
    }
    out = plan.shard_chunk(chunk)
    x_spec = out["x"].sharding.spec
    assert x_spec[0] == "clients" and x_spec[2] == "data"
    assert out["step_valid"].sharding.spec[0] == "clients"
    assert out["odd"].sharding.spec[0] == "clients"
    assert len(out["odd"].sharding.spec) < 3 or out["odd"].sharding.spec[2] is None

    ev = plan.shard_eval_batch({"x": np.zeros((16, 4)), "y": np.zeros((15,))})
    assert ev["x"].sharding.spec[0] == ("clients", "data")
    assert not ev["y"].sharding.spec  # non-divisible -> replicated


def test_tensor_parallel_model_axis_matches_1dev():
    """(clients=2, model=2) TP mesh: Megatron-style sharded block kernels
    (fc1/qkv column-parallel, fc2/proj row-parallel, vocab-sharded word
    embeddings) must reproduce the single-device round; XLA inserts the
    collectives (SURVEY.md §2.8 P5 optional TP for larger MATs)."""
    s1 = _run([1], optimizer="SGD", lr=1e-2)
    stp = _run([2, 2], ["clients", "model"], optimizer="SGD", lr=1e-2)
    assert dict(stp.mesh.shape) == {"clients": 2, "model": 2}
    f1, f2 = _flat(s1), _flat(stp)
    for k in f1:
        np.testing.assert_allclose(f1[k], f2[k], rtol=2e-5, atol=2e-6,
                                   err_msg=k)
    for ds in ("CIFAR100", "AG_NEWS"):
        r1 = s1.results[1][f"server_evaluated_{ds}"]
        r2 = stp.results[1][f"server_evaluated_{ds}"]
        assert abs(r1["loss"] - r2["loss"]) < 1e-4


def test_tp_leaf_specs():
    plan = MeshPlan.build([2, 2], ["clients", "model"])
    import jax.numpy as jnp
    tree = {"blk": {"0": {
        "fc1_kernel": jnp.zeros((2, 2, 8, 32)),
        "fc2_kernel": jnp.zeros((2, 2, 32, 8)),
        "qkv_bias": jnp.zeros((2, 2, 24)),
        "norm1_scale": jnp.zeros((2, 2, 8)),
    }}, "emb": {"1": {"word": jnp.zeros((2, 40, 8))}}}
    out = plan.shard_client_tree(tree)
    def spec4(x, n):
        t = tuple(x.sharding.spec)
        return t + (None,) * (n - len(t))
    b = out["blk"]["0"]
    assert spec4(b["fc1_kernel"], 4) == ("clients", None, None, "model")
    assert spec4(b["fc2_kernel"], 4) == ("clients", None, "model", None)
    assert spec4(b["qkv_bias"], 3) == ("clients", None, "model")
    assert spec4(b["norm1_scale"], 3) == ("clients", None, None)
    assert spec4(out["emb"]["1"]["word"], 3) == ("clients", "model", None)


def test_pallas_kernels_under_sharded_clients_mesh():
    """Interpret-mode smoke for the fused-kernel/mesh composition: the
    Pallas sublayers (whose custom_vmap rules turn the client axis into
    an outer grid dimension) must compile and execute — forward AND
    backward — when the vmapped client axis is sharded over a >1-device
    mesh, matching plain-math numerics per client.  Real-TPU runs verify
    the kernels single-device only (PARITY.md boundary); this closes the
    composition structurally on the virtual CPU mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from fedcola_tpu.ops.fused_attention import make_fused_attention_sublayer
    from fedcola_tpu.ops.fused_mlp import fused_mlp_sublayer_items

    C, B, N, D, H = 4, 2, 12, 16, 2
    hd = D // H
    rng = np.random.RandomState(0)

    def r(*s):
        return jnp.asarray(rng.randn(*s) * 0.2, jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:2]), ("clients",))
    sh = NamedSharding(mesh, P("clients"))

    # --- fused attention sublayer ---
    args = (r(C, B, N, D), r(C, D) + 1, r(C, D), r(C, D, 3 * D),
            r(C, 3 * D), r(C, D, D), r(C, D))
    sharded = tuple(jax.device_put(a, sh) for a in args)
    attn = jax.vmap(make_fused_attention_sublayer(H))

    def loss(*a):
        return jnp.sum(jnp.square(attn(*a)))

    out = jax.jit(attn)(*sharded)
    grads = jax.jit(jax.grad(loss, argnums=tuple(range(7))))(*sharded)

    def plain(x, lns, lnb, wqkv, bqkv, wproj, bproj):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb
        qkv = (h @ wqkv + bqkv).reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
        p = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k), axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3)
        return o.reshape(B, N, D) @ wproj + bproj

    vplain = jax.vmap(plain)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vplain(*args)),
                               rtol=2e-4, atol=2e-5)
    gref = jax.grad(lambda *a: jnp.sum(jnp.square(vplain(*a))),
                    argnums=tuple(range(7)))(*args)
    for a, b in zip(grads, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)

    # --- fused MLP sublayer (items mode) ---
    HID = 4 * D
    margs = (r(C, B, N, D), r(C, D) + 1, r(C, D), r(C, D, HID),
             r(C, HID), r(C, HID, D), r(C, D))
    msharded = tuple(jax.device_put(a, sh) for a in margs)
    mlp = jax.vmap(fused_mlp_sublayer_items)

    def mloss(*a):
        return jnp.sum(jnp.square(mlp(*a)))

    mout = jax.jit(mlp)(*msharded)
    mgrads = jax.jit(jax.grad(mloss, argnums=tuple(range(7))))(*msharded)

    def mplain(x, lns, lnb, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb
        return jax.nn.gelu(h @ w1 + b1, approximate=False) @ w2 + b2

    vmplain = jax.vmap(mplain)
    np.testing.assert_allclose(np.asarray(mout), np.asarray(vmplain(*margs)),
                               rtol=2e-4, atol=2e-5)
    mgref = jax.grad(lambda *a: jnp.sum(jnp.square(vmplain(*a))),
                     argnums=tuple(range(7)))(*margs)
    for a, b in zip(mgrads, mgref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_residual_folded_kernels_under_sharded_clients_mesh():
    """Same composition smoke for the residual-folded variants (the
    production 'kernel'-policy path folds the residual join + DropPath
    scale into the kernels): forward AND backward under a sharded
    clients axis must match plain x + s*f(x) math per client."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from fedcola_tpu.ops.fused_attention import \
        make_fused_attention_residual_sublayer
    from fedcola_tpu.ops.fused_mlp import fused_mlp_residual_sublayer_items

    C, B, N, D, H = 4, 2, 12, 16, 2
    hd = D // H
    rng = np.random.RandomState(3)

    def r(*s):
        return jnp.asarray(rng.randn(*s) * 0.2, jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:2]), ("clients",))
    sh = NamedSharding(mesh, P("clients"))
    s = jnp.asarray(rng.choice([0.0, 1.0 / 0.9], size=(C, B)), jnp.float32)

    # --- residual attention ---
    args = (r(C, B, N, D), s, r(C, D) + 1, r(C, D), r(C, D, 3 * D),
            r(C, 3 * D), r(C, D, D), r(C, D))
    sharded = tuple(jax.device_put(a, sh) for a in args)
    attn = jax.vmap(make_fused_attention_residual_sublayer(H))

    def plain(x, s, lns, lnb, wqkv, bqkv, wproj, bproj):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb
        qkv = (h @ wqkv + bqkv).reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
        p = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k), axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3)
        return x + s[:, None, None] * (o.reshape(B, N, D) @ wproj + bproj)

    out = jax.jit(attn)(*sharded)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jax.vmap(plain)(*args)),
                               rtol=2e-4, atol=2e-5)
    g = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.square(attn(*a))),
                         argnums=(0, 4, 6)))(*sharded)
    gr = jax.grad(lambda *a: jnp.sum(jnp.square(jax.vmap(plain)(*a))),
                  argnums=(0, 4, 6))(*args)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)

    # --- residual MLP (items mode) ---
    HID = 4 * D
    margs = (r(C, B, N, D), s, r(C, D) + 1, r(C, D), r(C, D, HID),
             r(C, HID), r(C, HID, D), r(C, D))
    msharded = tuple(jax.device_put(a, sh) for a in margs)
    mlp = jax.vmap(fused_mlp_residual_sublayer_items)

    def mplain(x, s, lns, lnb, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb
        h = jax.nn.gelu(h @ w1 + b1, approximate=False)
        return x + s[:, None, None] * (h @ w2 + b2)

    mout = jax.jit(mlp)(*msharded)
    np.testing.assert_allclose(np.asarray(mout),
                               np.asarray(jax.vmap(mplain)(*margs)),
                               rtol=2e-4, atol=2e-5)
    mg = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.square(mlp(*a))),
                          argnums=(0, 4, 6)))(*msharded)
    mgr = jax.grad(lambda *a: jnp.sum(jnp.square(jax.vmap(mplain)(*a))),
                   argnums=(0, 4, 6))(*margs)
    for a, b in zip(mg, mgr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
