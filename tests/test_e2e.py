"""End-to-end integration: a 2-round toy federation on CPU.

Mirrors SURVEY.md §7 build step 4 (minimum slice: text-only fedavg) and
step 5 (mixed img/txt/mm populations with FedCola sharing rules).
"""

import numpy as np
import pytest

from fedcola_tpu.config import ExperimentConfig, check_args
from fedcola_tpu.data.loaders import load_federated_data
from fedcola_tpu.federation.server import create_server


def make_cfg(**kw):
    base = dict(
        exp_name="test", seed=7, multi_task=True,
        datasets=["MedicalAbstracts", "MedicalAbstracts"],
        modalities=["txt", "txt"],
        Ks=[4], Cs=[0.5], K=4, R=2, E=1, B=16,
        eval_batch_size=32, optimizer="AdamW", lr=1e-3,
        criterion="CrossEntropyLoss", eval_type="global",
        model_name="mome_test_patch16_32", seq_len=12,
        split_type="iid", synthetic_data=True, use_pallas=False,
        compute_dtype="float32", equal_sampled=True,
        train_chunk_steps=4, resize=32, vocab_size=120,
        # 2-device mesh: exercises the sharded client axis without padding
        # small groups up to all 8 virtual devices
        mesh_shape=[2],
    )
    base.update(kw)
    return check_args(ExperimentConfig(**base))


def run_rounds(cfg, rounds=2):
    rng = np.random.RandomState(cfg.seed)
    data = load_federated_data(cfg, rng)
    server = create_server(cfg, data)
    for r in range(1, rounds + 1):
        server.round = r
        sampled = server.update()
        assert sampled, "no clients sampled"
    server.evaluate([])
    return server


def test_text_only_fedavg():
    """Build step 4: text-only MedicalAbstracts clients, tiny MAT."""
    cfg = make_cfg()
    server = run_rounds(cfg)
    key = "server_evaluated_MedicalAbstracts"
    res = server.results[2][key]
    assert np.isfinite(res["loss"])
    assert 0.0 <= res["metrics"]["acc1"] <= 1.0


def test_mixed_population_fedcola():
    """Build step 5-6: img + txt + mm clients, FedCola sharing
    (shared_param=attn, share_scope=modality, compensation, aux)."""
    cfg = make_cfg(
        datasets=["CIFAR100", "AG_NEWS", "Coco", "Coco"],
        modalities=["img", "txt", "img+txt", "img+txt"],
        Ks=[2, 2, 2], Cs=[0.5, 0.5, 0.5],
        shared_param="attn", share_scope="modality",
        compensation=True, with_aux=True, aux_trained=True,
        split_type="diri", cncntrtn=0.5, B=8,
    )
    server = run_rounds(cfg)
    # aggregation ran for all three global models
    assert set(server.global_params) == {"CIFAR100", "AG_NEWS", "Coco"}
    # aux exchange happened: img model's aux == txt model's blk kernels
    img_aux = server.global_params["CIFAR100"]["aux"]["qkv_aux"]
    txt_blk = server.global_params["AG_NEWS"]["blk"]["1"]["qkv_kernel"]
    np.testing.assert_allclose(np.asarray(img_aux), np.asarray(txt_blk))
    # retrieval eval produced recalls
    ev = server.results[2]["server_evaluated_Coco"]
    assert any("r@1sum" in k for k in ev)


@pytest.mark.slow
def test_warmup_freeze_and_fedavg_eval():
    """Warmup rounds filter sampled modalities (fedavgserver.py:307-308);
    the freeze window compiles a frozen-mask program variant; --fedavg_eval
    pre-evaluates a plain aggregate then restores."""
    cfg = make_cfg(
        datasets=["CIFAR100", "AG_NEWS", "AG_NEWS"],
        modalities=["img", "txt", "txt"],
        Ks=[2, 2], Cs=[1.0, 1.0],
        shared_param="attn", share_scope="all",
        warmup_modality="img", warmup_rounds=1,
        freeze_modality="txt", freeze_rounds=1,
        fedavg_eval=True, B=8,
    )
    rng = np.random.RandomState(cfg.seed)
    from fedcola_tpu.data.loaders import load_federated_data
    data = load_federated_data(cfg, rng)
    server = create_server(cfg, data)
    server.round = 1
    sampled = server.update()          # warmup: img only
    assert all(server.clients[i].modality == "img" for i in sampled)
    server.round = 2                   # freeze window for txt clients
    sampled = server.update()
    assert any(server.clients[i].modality == "txt" for i in sampled)
    # fedavg_eval produced the pre-aggregate eval entries
    assert any(k.endswith("_fedavg") for k in server.results[2])


@pytest.mark.slow
def test_creamfl_runs():
    """CreamFL: public-set phases + contrastive-weighted feature aggregation
    + zero-init mm aggregate + server distillation."""
    cfg = make_cfg(
        algorithm="creamfl",
        datasets=["CIFAR100", "AG_NEWS", "Coco", "Coco"],
        modalities=["img", "txt", "img+txt", "img+txt"],
        Ks=[2, 2, 2], Cs=[1.0, 1.0, 1.0],
        num_pub_samples=20, pub_batch_size=8, kd_weight=1e-3,
        interintra_weight=1.0, B=8, split_type="diri", cncntrtn=0.5,
    )
    server = run_rounds(cfg, rounds=1)
    assert server.g_img is not None and server.g_img.shape[0] == 20
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(
                  server.global_params["Coco"])]
    assert all(np.isfinite(l).all() for l in leaves)


def test_creamfl_shares_aug_routing():
    """Regression (structural): the aug/residency routing is one shared
    helper (_group_aug_plan) — the CreamFL train path had its own copy
    that silently evicted crop/flip runs from the HBM-resident plane
    while fedavg kept them resident."""
    from fedcola_tpu.federation.creamfl import CreamflServer
    from fedcola_tpu.federation.server import FedAvgServer
    assert CreamflServer._group_aug_plan is FedAvgServer._group_aug_plan


@pytest.mark.slow
def test_creamfl_aug_keeps_residency():
    """Regression (functional): a CreamFL round with --crop/--randhf
    trains every img-bearing group from the HBM-resident plane."""
    cfg = make_cfg(
        algorithm="creamfl",
        datasets=["CIFAR100", "AG_NEWS", "Coco", "Coco"],
        modalities=["img", "txt", "img+txt", "img+txt"],
        Ks=[2, 2, 2], Cs=[1.0, 1.0, 1.0],
        num_pub_samples=8, pub_batch_size=8, kd_weight=1e-3,
        interintra_weight=1.0, B=8, crop=32, randhf=0.5,
    )
    rng = np.random.RandomState(cfg.seed)
    data = load_federated_data(cfg, rng)
    server = create_server(cfg, data)
    server.round = 1
    assert server.update()
    # both img-bearing groups trained from the resident plane despite aug
    assert server._resident_cache.get("CIFAR100") is not None
    assert server._resident_cache.get("Coco") is not None


@pytest.mark.slow
def test_fedprox_and_fedopt_run():
    cfg = make_cfg(algorithm="fedprox", mu=0.01)
    run_rounds(cfg, rounds=1)
    cfg = make_cfg(algorithm="fedadam", beta1=0.9)
    run_rounds(cfg, rounds=1)


def test_fedopt_step_semantics():
    """_fedopt_step closed-form checks: b1=0 fedavgm is plain lr-scaled
    delta (--beta1 0, the CLI default, must mean NO server momentum), and
    b1=0.9 applies the FedOpt-paper recurrence."""
    import jax.numpy as jnp
    from fedcola_tpu.federation.fedopt import _fedopt_step
    g = {"w": jnp.asarray([1.0, 2.0])}
    a = {"w": jnp.asarray([1.5, 1.0])}
    z = {"w": jnp.zeros(2)}
    ng, nm, _ = _fedopt_step(g, a, z, z, jnp.float32(0.1),
                             flavor="fedavgm", b1=0.0, b2=0.99, tau=1e-3)
    np.testing.assert_allclose(ng["w"], [1.05, 1.9], rtol=1e-6)
    ng, nm, _ = _fedopt_step(g, a, z, z, jnp.float32(0.1),
                             flavor="fedavgm", b1=0.9, b2=0.99, tau=1e-3)
    np.testing.assert_allclose(nm["w"], [0.05, -0.1], rtol=1e-6)
    np.testing.assert_allclose(ng["w"], [1.005, 1.99], rtol=1e-6)


def test_server_lr_identity_anchor():
    """--server_lr wiring check via the closed form: fedavgm with
    beta1=0 and server_lr=1 applies g + 1*(aggregate - g) — exactly the
    plain FedAvg aggregate.  Sampling is stateless, so a FedAvgServer
    over the same data/seed/round produces the identical cohort and
    aggregate to compare against."""
    import jax
    cfg_m = make_cfg(algorithm="fedavgm", beta1=0.0, server_lr=1.0,
                     R=1, Ks=[4], Cs=[0.5])
    cfg_a = make_cfg(algorithm="fedavg", R=1, Ks=[4], Cs=[0.5])
    rng = np.random.RandomState(cfg_a.seed)
    data = load_federated_data(cfg_a, rng)
    sa = create_server(cfg_a, data)
    sa.round = 1
    sa.update()
    sm = create_server(cfg_m, data)
    sm.round = 1
    sm.update()
    for ds in sa.global_params:
        la = jax.tree_util.tree_leaves(sa.global_params[ds])
        lm = jax.tree_util.tree_leaves(sm.global_params[ds])
        for x, y in zip(la, lm):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-6)


def test_fedopt_with_aux_resyncs_exchange():
    """Regression: the fedopt server step runs BEFORE the aux exchange is
    final — aux weights must end the round as exact copies of the other
    modality's post-step kernels, not a tiny optimizer move away from
    their old values (which would silently disable FedCola's exchange)."""
    cfg = make_cfg(
        algorithm="fedyogi", beta1=0.0,
        datasets=["MedMNIST", "MedicalAbstracts", "MedicalAbstracts"],
        modalities=["img", "txt", "txt"],
        Ks=[2, 2], Cs=[1.0, 1.0],
        with_aux=True, shared_param="attn", share_scope="modality")
    rng = np.random.RandomState(cfg.seed)
    data = load_federated_data(cfg, rng)
    server = create_server(cfg, data)
    server.round = 1
    assert server.update()
    other_of = {"MedMNIST": "MedicalAbstracts",
                "MedicalAbstracts": "MedMNIST"}
    checked = 0
    for ds, params in server.global_params.items():
        if "aux" not in params:
            continue
        src = server.global_params[other_of[ds]]
        src_cfg = server.model_cfgs[other_of[ds]]
        src_blk = src["blk"][str(src_cfg.main_slot)]
        for kind in server.model_cfgs[ds].aux_layer_kinds:
            np.testing.assert_array_equal(
                np.asarray(params["aux"][f"{kind}_aux"]),
                np.asarray(src_blk[f"{kind}_kernel"]))
            checked += 1
    assert checked > 0


def test_resume_reproduces_uninterrupted_run(tmp_path):
    """Checkpoint/resume round-trip: 2 rounds straight == 1 round +
    checkpoint + fresh server + load + 1 round, bit-for-bit.  Covers the
    stateless sampling, the persisted shuffle-rng/jax-key stream, and
    (via fedadam) the FedOpt server moments."""
    import jax
    cfg = make_cfg(algorithm="fedadam", beta1=0.9, R=2, Ks=[4], Cs=[0.5])
    rng = np.random.RandomState(cfg.seed)
    data = load_federated_data(cfg, rng)

    straight = create_server(cfg, data)
    for r in (1, 2):
        straight.round = r
        straight.update()

    a = create_server(cfg, data)
    a.round = 1
    a.update()
    ck = str(tmp_path / "ck")
    a.save_checkpoint(ck)

    b = create_server(cfg, data)
    b.load_checkpoint(ck)
    assert b.round == 1 and np.isclose(b.curr_lr, a.curr_lr)
    b.round = 2
    b.update()

    for ds in straight.global_params:
        la = jax.tree_util.tree_leaves(straight.global_params[ds])
        lb = jax.tree_util.tree_leaves(b.global_params[ds])
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_local_eval_on_holdouts():
    """--eval_type both: per-client holdout evaluation (the reference's is
    broken for MAT, fedavgclient.py:140 — ours implements the intended
    semantics) rides the resident plane and produces cohort summaries."""
    cfg = make_cfg(eval_type="both", test_size=0.2, R=1)
    rng = np.random.RandomState(cfg.seed)
    from fedcola_tpu.data.loaders import load_federated_data
    data = load_federated_data(cfg, rng)
    assert any(s.test_indices is not None and len(s.test_indices)
               for s in data.client_shards)
    server = create_server(cfg, data)
    server.round = 1
    sampled = server.update()
    server.evaluate(sampled)
    res = server.results[1]
    assert "clients_evaluated_in" in res or "clients_evaluated_out" in res
    key = ("clients_evaluated_in" if "clients_evaluated_in" in res
           else "clients_evaluated_out")
    assert np.isfinite(res[key]["loss"]["avg"])


def test_creamfl_pub_staging_budget_gate(tmp_path, monkeypatch):
    """The pub-set device staging honors FEDCOLA_RESIDENT_BUDGET: over
    budget -> per-pass host feed (no pinned batches); within budget ->
    staged once; finalize() frees the pinned state."""
    cfg = make_cfg(
        algorithm="creamfl",
        datasets=["CIFAR100", "AG_NEWS", "Coco", "Coco"],
        modalities=["img", "txt", "img+txt", "img+txt"],
        Ks=[2, 2, 2], Cs=[1.0, 1.0, 1.0],
        num_pub_samples=20, pub_batch_size=8, B=8,
        split_type="diri", cncntrtn=0.5,
        result_path=str(tmp_path), log_path=str(tmp_path))
    rng = np.random.RandomState(cfg.seed)
    from fedcola_tpu.data.loaders import load_federated_data
    data = load_federated_data(cfg, rng)
    server = create_server(cfg, data)

    monkeypatch.setenv("FEDCOLA_RESIDENT_BUDGET", "0")
    batches = list(server._pub_batches())
    assert len(batches) == 3                     # ceil(20/8)
    assert getattr(server, "_pub_batches_dev", None) is None

    monkeypatch.setenv("FEDCOLA_RESIDENT_BUDGET", str(6 * 1024 ** 3))
    batches = list(server._pub_batches())
    assert server._pub_batches_dev is not None
    server.finalize()
    assert server._pub_batches_dev is None and server.g_img is None


def test_batched_local_eval_matches_serial(monkeypatch):
    """The vmapped+scanned batched local eval (resident plane) must produce
    the same cohort summaries as the serial host-fed fallback."""
    def run(budget):
        monkeypatch.setenv("FEDCOLA_RESIDENT_BUDGET", str(budget))
        cfg = make_cfg(eval_type="both", test_size=0.2, R=1)
        rng = np.random.RandomState(cfg.seed)
        from fedcola_tpu.data.loaders import load_federated_data
        data = load_federated_data(cfg, rng)
        server = create_server(cfg, data)
        server.round = 1
        sampled = server.update()
        server.evaluate(sampled)
        key = ("clients_evaluated_in"
               if "clients_evaluated_in" in server.results[1]
               else "clients_evaluated_out")
        return server.results[1][key]["loss"]

    batched = run(6 * 1024 ** 3)       # resident -> batched path
    serial = run(0)                    # budget 0 -> serial host fallback
    for k in ("avg", "std", "top10p_avg", "bottom10p_avg"):
        assert batched[k] == pytest.approx(serial[k], abs=1e-5), k
