"""Aggregation parity tests.

Golden model: a direct numpy simulation of the reference's sequential
streaming accumulate (fedavgserver.py:591-668) run against the same
coefficients — the planned closed-form reduction must match bit-for-bit up
to float tolerance, including residual-global-weight effects when
coefficient sums != 1 and the "skip but count" behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedcola_tpu.models.mat import MATConfig, init_mat
from fedcola_tpu.models import naming
from fedcola_tpu.federation import aggregate as agg


def toy_cfgs(shared_param="attn", share_scope="modality", with_aux=False):
    base = dict(img_size=32, patch_size=16, embed_dim=8, depth=2, num_heads=2,
                vocab_size=50, max_text_len=8, use_pallas=False,
                compute_dtype="float32", shared_param=shared_param,
                share_scope=share_scope)
    return {
        "CIFAR100": MATConfig(modalities=("img", None), tasks=("cls", None),
                              num_classes=(10, None), with_aux=with_aux, **base),
        "AG_NEWS": MATConfig(modalities=(None, "txt"), tasks=(None, "cls"),
                             num_classes=(None, 4), with_aux=with_aux, **base),
        "Coco": MATConfig(modalities=("img", "txt"), tasks=("rtv", "rtv"),
                          num_classes=(None, None), with_aux=with_aux, **base),
    }


MODALITY = {"CIFAR100": "img", "AG_NEWS": "txt", "Coco": "img+txt"}
TASK = {"CIFAR100": "cls", "AG_NEWS": "cls", "Coco": "rtv"}
EXP_MODALITIES = ["img", "txt", "img+txt", "img+txt"]


def make_world(cfgs, seed=0, sizes=(100, 80, 60, 40, 30)):
    """2 CIFAR clients, 2 AG_NEWS, 1 Coco."""
    rng = np.random.RandomState(seed)
    datasets = ["CIFAR100", "CIFAR100", "AG_NEWS", "AG_NEWS", "Coco"]
    clients = {}
    for i, (ds, n) in enumerate(zip(datasets, sizes)):
        clients[i] = agg.ClientMeta(id=i, dataset=ds, modality=MODALITY[ds],
                                    task=TASK[ds], n_train=n)
    return clients


def named_upload(cfg, params):
    """Flat name -> numpy array view of a client's upload (aliases incl.)."""
    return {name: np.asarray(naming.get_by_path(params, path))
            for path, name in naming.upload_param_names(cfg)}


def reference_streaming(global_named, coeffs, uploads_by_id, sorted_ids):
    """Direct simulation of fedavgserver.py:655-664."""
    final = {k: v.copy() for k, v in global_named.items()}
    for cid in sorted_ids:
        up = uploads_by_id[cid]
        for name in coeffs:
            c = coeffs[name].get(cid, 0.0)
            if c == 0.0 or name not in up:
                continue
            final[name] = final[name] + (up[name] - final[name]) * c
    return final


@pytest.mark.parametrize("shared_param,share_scope,compensation", [
    ("none", "dataset", False),          # FedAVG
    ("attn", "modality", True),          # FedCola
    ("blocks", "modality_exact", False),  # FedIoT
    ("attn", "all", False),
    ("attn", "modality", False),
])
def test_closed_form_matches_streaming(shared_param, share_scope, compensation):
    cfgs = toy_cfgs(shared_param, share_scope)
    clients = make_world(cfgs)
    sorted_ids = [0, 1, 2, 3, 4]
    updated_sizes = {c.id: c.n_train for c in clients.values()}

    # per-client params (each client's model = its dataset's structure)
    key = jax.random.PRNGKey(7)
    client_params = {}
    for cid, c in clients.items():
        key, k = jax.random.split(key)
        client_params[cid] = init_mat(cfgs[c.dataset], k)
    group_members = {}
    for cid, c in clients.items():
        group_members.setdefault(c.dataset, []).append(cid)
    stacked = {
        ds: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                   *[client_params[cid] for cid in ids])
        for ds, ids in group_members.items()
    }

    # scope table over the union of model names (fedavgserver.py:190-196)
    all_names = []
    for cfg in cfgs.values():
        for _, n in naming.param_names(cfg):
            if n not in all_names:
                all_names.append(n)
    param_scope = naming.build_param_scope(all_names, shared_param, share_scope)

    key, k = jax.random.split(key)
    for model_ds, cfg in cfgs.items():
        key, k = jax.random.split(key)
        gparams = init_mat(cfg, k)

        jobs, weights = agg.plan_aggregation(
            model_ds, cfg, {d: cfgs[d] for d in group_members},
            clients, sorted_ids, updated_sizes, param_scope,
            EXP_MODALITIES, group_members,
            out_modality_scale=1.0, compensation=compensation,
            share_scope=share_scope, fedavg=False,
            model_modality=MODALITY[model_ds], model_task=TASK[model_ds])
        new_params = agg.apply_aggregation(jobs, weights, gparams, stacked)

        # golden: naive streaming on flat names
        required = naming.required_param_names(cfg)
        global_named = {n: np.asarray(naming.get_by_path(gparams, p))
                        for p, n in required}
        coeffs = agg.compute_coefficients(
            model_ds, MODALITY[model_ds], TASK[model_ds],
            [n for _, n in required], param_scope, clients, sorted_ids,
            updated_sizes, EXP_MODALITIES, 1.0, compensation, share_scope)
        uploads_by_id = {cid: named_upload(cfgs[clients[cid].dataset],
                                           client_params[cid])
                         for cid in sorted_ids}
        golden = reference_streaming(global_named, coeffs, uploads_by_id,
                                     sorted_ids)

        for path, name in required:
            got = np.asarray(naming.get_by_path(new_params, path))
            np.testing.assert_allclose(
                got, golden[name], rtol=2e-5, atol=2e-6,
                err_msg=f"{model_ds}:{name} ({shared_param}/{share_scope})")


def test_out_modality_scale_and_compensation_weights():
    """Hand-check a tiny coefficient table: FedCola config, Coco model."""
    cfgs = toy_cfgs("attn", "modality")
    clients = make_world(cfgs)
    sorted_ids = [0, 1, 2, 3, 4]
    sizes = {c.id: c.n_train for c in clients.values()}
    names = ["blockses.0.*.attn.qkv.weight", "norm.weight"]
    scope = naming.build_param_scope(names, "attn", "modality")
    assert scope["blockses.0.*.attn.qkv.weight"] == "modality"
    assert scope["norm.weight"] == "dataset"

    co = agg.compute_coefficients(
        "Coco", "img+txt", "rtv", names, scope, clients, sorted_ids, sizes,
        EXP_MODALITIES, out_modality_scale=0.5, compensation=True,
        share_scope="modality")
    # attn param, modality scope vs 'img+txt': everyone overlaps ->
    # numerators: out-modality clients (all but Coco) scaled by 0.5
    c = co["blockses.0.*.attn.qkv.weight"]
    denom = 100 + 80 + 60 + 40 + 30   # compensation: modality-overlap total
    np.testing.assert_allclose(c[0], 50 / denom)
    np.testing.assert_allclose(c[4], 30 / denom)
    # dataset-scope param: only Coco contributes; compensation uses overlap
    # denominator as well
    c2 = co["norm.weight"]
    np.testing.assert_allclose(c2[4], 30 / denom)
    assert c2[0] == 0.0


def test_scope_all_alias_upload():
    """scope='all' ties absent-modality blocks (mome.py:824-827): an img
    client's upload must expose blockses.1.* names aliased to its main
    stack, so txt models aggregate from img clients."""
    cfgs = toy_cfgs("attn", "all")
    up = naming.upload_param_names(cfgs["CIFAR100"])
    names = {n for _, n in up}
    assert "blockses.1.*.attn.qkv.weight" in names
    path = dict((n, p) for p, n in up)["blockses.1.*.attn.qkv.weight"]
    assert path == ("blk", "0", "qkv_kernel")


def test_modality_scope_skip_but_count():
    """mm model's txt-stack attn under share_scope='modality': img clients
    get nonzero coefficients but upload no blockses.1 -> residual global
    weight must remain (fedavgserver.py:660-663)."""
    cfgs = toy_cfgs("attn", "modality")
    clients = make_world(cfgs)
    sorted_ids = [0, 1, 2, 3, 4]
    sizes = {c.id: c.n_train for c in clients.values()}
    name = "blockses.1.*.attn.qkv.weight"
    scope = naming.build_param_scope([name], "attn", "modality")
    co = agg.compute_coefficients("Coco", "img+txt", "rtv", [name], scope,
                                  clients, sorted_ids, sizes, EXP_MODALITIES)
    c = co[name]
    assert c[0] > 0 and c[1] > 0  # img clients counted in normalisation
    # closed form: contribs only from clients that HAVE the param
    contribs = [(cid, c[cid]) for cid in sorted_ids
                if clients[cid].dataset in ("AG_NEWS", "Coco")]
    res, w = agg.streaming_closed_form(1.0, contribs)
    assert res > 0  # residue of the old global value survives
    np.testing.assert_allclose(res + sum(w), 1.0 - sum(
        0 for _ in contribs), rtol=1e-6) if abs(sum(c.values()) - 1) < 1e-9 \
        else None


def test_creamfl_zero_init_aggregation():
    """CreamFL's mm aggregate: zero-init plain weighted sum with its own
    coefficient variant (creamflserver.py:251-292)."""
    cfgs = toy_cfgs("none", "dataset")
    clients = make_world(cfgs)
    sorted_ids = [0, 1, 2, 3, 4]
    sizes = {c.id: c.n_train for c in clients.values()}
    key = jax.random.PRNGKey(3)
    client_params = {}
    for cid, c in clients.items():
        key, k = jax.random.split(key)
        client_params[cid] = init_mat(cfgs[c.dataset], k)
    group_members = {}
    for cid, c in clients.items():
        group_members.setdefault(c.dataset, []).append(cid)
    stacked = {
        ds: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                   *[client_params[cid] for cid in ids])
        for ds, ids in group_members.items()
    }
    all_names = []
    for cfg in cfgs.values():
        for _, n in naming.param_names(cfg):
            if n not in all_names:
                all_names.append(n)
    scope = naming.build_param_scope(all_names, "none", "dataset")

    key, k = jax.random.split(key)
    gparams = init_mat(cfgs["Coco"], k)
    jobs, weights = agg.plan_aggregation(
        "Coco", cfgs["Coco"], {d: cfgs[d] for d in group_members},
        clients, sorted_ids, sizes, scope, EXP_MODALITIES, group_members,
        creamfl=True, zero_init=True,
        model_modality="img+txt", model_task="rtv")
    new_params = agg.apply_aggregation(jobs, weights, gparams, stacked)

    # golden: zero-init Σ c_i w_i where only Coco clients contribute
    required = naming.required_param_names(cfgs["Coco"])
    coeffs = agg.compute_coefficients(
        "Coco", "img+txt", "rtv", [n for _, n in required], scope, clients,
        sorted_ids, sizes, EXP_MODALITIES, creamfl=True)
    uploads = {cid: named_upload(cfgs[clients[cid].dataset],
                                 client_params[cid]) for cid in sorted_ids}
    for path, name in required:
        golden = np.zeros_like(
            np.asarray(naming.get_by_path(gparams, path)))
        for cid in sorted_ids:
            c = coeffs[name].get(cid, 0.0)
            if c and name in uploads[cid]:
                golden = golden + uploads[cid][name] * c
        got = np.asarray(naming.get_by_path(new_params, path))
        np.testing.assert_allclose(got, golden, rtol=2e-5, atol=2e-6,
                                   err_msg=name)


def test_streaming_closed_form_golden():
    rng = np.random.RandomState(0)
    g = rng.randn(4)
    ws = [rng.randn(4) for _ in range(3)]
    cs = [0.3, 0.25, 0.2]
    # naive sequential
    f = g.copy()
    for w, c in zip(ws, cs):
        f = f + (w - f) * c
    res, eff = agg.streaming_closed_form(1.0, list(enumerate(cs)))
    got = res * g + sum(e * w for e, w in zip(eff, ws))
    np.testing.assert_allclose(got, f, rtol=1e-12)


def test_creamfl_zero_denominator_raises():
    """CreamFL normalisation has no zero-denominator guard upstream
    (creamflserver.py:276-279 divides unguarded): when no sampled client
    contributes to a param, raising beats the silent all-zero global the
    zero-init accumulate would otherwise write."""
    import pytest
    from fedcola_tpu.federation.aggregate import (ClientMeta,
                                                  compute_coefficients)

    clients = {0: ClientMeta(0, "CIFAR100", "img", "cls", 10)}
    with pytest.raises(ZeroDivisionError, match="no sampled client"):
        compute_coefficients(
            model_dataset="Coco", model_modality="img+txt",
            model_task="rtv", required_names=["norm.weight"],
            param_scope={"norm.weight": "dataset"}, clients=clients,
            sorted_ids=[0], updated_sizes={0: 10},
            experiment_modalities=["img", "img+txt"], creamfl=True)
