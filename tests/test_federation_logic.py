"""Host-side federation logic: sampling, warmup filtering, scope tables,
freeze masks, checkpoint roundtrip, config parsing."""


import numpy as np
import pytest

from fedcola_tpu.config import ExperimentConfig, check_args, parse_args
from fedcola_tpu.data.sampling import sample_clients
from fedcola_tpu.models import naming
from fedcola_tpu.models.mat import MATConfig


def test_equal_sampled_per_dataset():
    ds_of = ["A"] * 8 + ["B"] * 4
    mod_of = ["img"] * 8 + ["txt"] * 4
    ids = sample_clients(0, ds_of, mod_of, ["A", "B"],
                         {"A": 0.25, "B": 0.5}, 0.1, True, round_idx=10)
    assert len([i for i in ids if i < 8]) == 2     # 0.25 * 8
    assert len([i for i in ids if i >= 8]) == 2    # 0.5 * 4
    assert ids == sorted(ids)
    # stateless: the same (seed, round) always yields the same cohort,
    # no matter what was sampled before (checkpoint/resume parity)
    assert ids == sample_clients(0, ds_of, mod_of, ["A", "B"],
                                 {"A": 0.25, "B": 0.5}, 0.1, True,
                                 round_idx=10)


def test_warmup_filters_modalities():
    ds_of = ["A"] * 4 + ["B"] * 4
    mod_of = ["img"] * 4 + ["txt"] * 4
    ids = sample_clients(0, ds_of, mod_of, ["A", "B"], {"A": 1.0, "B": 1.0},
                         1.0, True, round_idx=3, warmup_modality="img",
                         warmup_rounds=5)
    assert all(mod_of[i] == "img" for i in ids)
    ids = sample_clients(0, ds_of, mod_of, ["A", "B"],
                         {"A": 1.0, "B": 1.0}, 1.0, True, round_idx=6,
                         warmup_modality="img", warmup_rounds=5)
    assert any(mod_of[i] == "txt" for i in ids)


def test_scope_table_precedence():
    """The substring-precedence quirks (fedavgserver.py:94-104):
    block-mlp params classify as 'blocks', so shared_param='mlp' shares
    nothing for MAT; attn-in-block classifies as 'attn'."""
    names = ["blockses.0.*.attn.qkv.weight", "blockses.0.*.mlp.fc1.weight",
             "blockses.0.*.norm1.weight", "embeddings.0.embed.proj.weight",
             "norm.weight", "heads.0.head.weight"]
    s = naming.build_param_scope(names, "attn", "modality")
    assert s["blockses.0.*.attn.qkv.weight"] == "modality"
    assert s["blockses.0.*.mlp.fc1.weight"] == "dataset"
    s = naming.build_param_scope(names, "blocks", "modality_exact")
    assert s["blockses.0.*.mlp.fc1.weight"] == "modality_exact"
    assert s["blockses.0.*.norm1.weight"] == "modality_exact"
    assert s["blockses.0.*.attn.qkv.weight"] == "dataset"
    s = naming.build_param_scope(names, "mlp", "all")
    assert all(v == "dataset" for v in s.values())


def test_get_name_modality():
    mods = ["img", "txt", "img+txt", "img+txt"]
    assert naming.get_name_modality("blockses.0.*.attn.qkv.weight", mods) == "img"
    assert naming.get_name_modality("blockses.1.*.mlp.fc1.weight", mods) == "txt"
    assert naming.get_name_modality("norm.weight", mods) is None


def test_check_args_broadcasts():
    cfg = ExperimentConfig(multi_task=True,
                           datasets=["A", "B", "C", "C"],
                           Ks=[4], Cs=[0.25],
                           optimizer="AdamW", out_modality_scales=[1.0])
    cfg = check_args(cfg)
    assert cfg.Ks == [4, 4, 4] and cfg.K == 12
    assert len(cfg.Cs) == 3 and len(cfg.out_modality_scales) == 3


def test_parse_args_reference_flags():
    cfg = parse_args([
        "--exp_name", "t", "--multi-task",
        "--datasets", "CIFAR100", "AG_NEWS", "Coco", "Coco",
        "--modalities", "img", "txt", "img+txt", "img+txt",
        "--Ks", "12", "12", "8", "--Cs", "0.25",
        "--shared_param", "attn", "--share_scope", "modality",
        "--compensation", "--with_aux", "--aux_trained",
        "--model_name", "mome_small_patch16", "--resize", "224", "--imnorm",
        "--algorithm", "fedavg", "--eval_type", "global",
        "--R", "30", "--E", "5", "--B", "96", "--beta1", "0",
        "--optimizer", "AdamW", "--lr", "1e-4", "--lr_decay", "0.99",
        "--lr_decay_step", "1", "--criterion", "CrossEntropyLoss",
        "--use_bert_tokenizer", "--pretrained", "--equal_sampled",
        "--eval_batch_size", "512",
        "--out_modality_scales", "[0.5]",
    ])
    assert cfg.K == 32 and cfg.with_aux and cfg.compensation
    assert cfg.out_modality_scales == [0.5, 0.5, 0.5]
    assert cfg.Cs == [0.25, 0.25, 0.25]


def test_upload_vs_required_names():
    cfg = MATConfig(modalities=("img", None), tasks=("cls", None),
                    num_classes=(10, None), embed_dim=8, depth=2,
                    num_heads=2, img_size=32, with_aux=True,
                    use_pallas=False)
    req = {n for _, n in naming.required_param_names(cfg)}
    assert not any("aux" in n or "cross_modal_scale" in n for n in req)
    assert not any("blockses.1" in n for n in req)
    aux = naming.aux_param_names(cfg)
    assert all("aux_weight" in n for _, n in aux)
    assert len(aux) == 4  # qkv, proj, fc1, fc2


def test_nan_guard_names_offending_clients():
    """Numerics guards (reference analog: torch detect_anomaly,
    main.py:307, which raises only on NaN in backward): by default a
    non-finite client loss is a warning and the run aborts at the
    post-aggregation global-params finiteness check; --detect_anomaly
    upgrades the loss readback itself to an immediate error naming
    dataset and clients."""
    from fedcola_tpu.data.loaders import load_federated_data
    from fedcola_tpu.federation.server import create_server

    def make(detect_anomaly):
        cfg = check_args(ExperimentConfig(
            exp_name="nan", seed=3, multi_task=True,
            datasets=["MedicalAbstracts", "MedicalAbstracts"],
            modalities=["txt", "txt"], Ks=[2], Cs=[1.0], K=2,
            R=1, E=3, B=16, eval_batch_size=32, optimizer="SGD",
            lr=1e20,  # diverges within the first local epochs
            criterion="CrossEntropyLoss", eval_type="global",
            model_name="mome_test_patch16_32", seq_len=8,
            split_type="iid", synthetic_data=True, use_pallas=False,
            compute_dtype="float32", equal_sampled=True,
            train_chunk_steps=4, resize=32, vocab_size=40, mesh_shape=[1],
            detect_anomaly=detect_anomaly))
        data = load_federated_data(cfg, np.random.RandomState(0))
        server = create_server(cfg, data)
        server.round = 1
        return server

    # default: the hard failure happens where corruption becomes permanent
    with pytest.raises(FloatingPointError,
                       match="aggregation produced non-finite"):
        make(detect_anomaly=False).update()
    # --detect_anomaly: fail at the loss readback, naming the clients
    with pytest.raises(FloatingPointError,
                       match="non-finite training loss.*MedicalAbstracts"):
        make(detect_anomaly=True).update()


def test_binary_last_dataset_rewrites_criterion_to_bce(monkeypatch):
    """src/utils.py:259-261 parity: when the final (server-eval) dataset is
    binary, the global criterion flips to BCEWithLogitsLoss."""
    from fedcola_tpu import config as cfgmod
    monkeypatch.setitem(cfgmod.NUM_CLASS, "BinaryToy", 2)
    monkeypatch.setitem(cfgmod.DATASET_2_TASK, "BinaryToy", "cls")
    monkeypatch.setitem(cfgmod.DATASET_2_MODALITY, "BinaryToy", "img")
    cfg = check_args(ExperimentConfig(
        multi_task=True, datasets=["BinaryToy", "BinaryToy"],
        modalities=["img"], Ks=[2], Cs=[1.0],
        criterion="CrossEntropyLoss"))
    assert cfg.criterion == "BCEWithLogitsLoss"
    cfg2 = check_args(ExperimentConfig(
        multi_task=True, datasets=["CIFAR100", "CIFAR100"],
        modalities=["img"], Ks=[2], Cs=[1.0],
        criterion="CrossEntropyLoss"))
    assert cfg2.criterion == "CrossEntropyLoss"


def test_duplicate_client_datasets_rejected_loudly():
    """Clients of one dataset name share a single TaskDataset and the
    servers key groups/models/aggregation by name, so a duplicated client
    entry must be rejected at check_args (the equivalent run is a single
    entry with the summed K), not crash deep in round 1."""
    with pytest.raises(ValueError, match="more than once"):
        check_args(ExperimentConfig(
            exp_name="dup", multi_task=True,
            datasets=["Coco", "Coco", "Coco"],
            modalities=["img+txt", "img+txt", "img+txt"],
            Ks=[2, 2], Cs=[1.0]))
    # the canonical layout (final entry repeats a client dataset) is fine
    check_args(ExperimentConfig(
        exp_name="ok", multi_task=True,
        datasets=["CIFAR100", "AG_NEWS", "Coco", "Coco"],
        modalities=["img", "txt", "img+txt", "img+txt"],
        Ks=[2, 2, 2], Cs=[1.0]))


def test_use_model_tokenizer_rejected_loudly():
    """--use_model_tokenizer parity (reference data.py:173-181): upstream
    asserts model_name in the legacy Bert family, so every mome_* MAT run
    fails there too — we reject at check_args with a pointer instead of
    silently ignoring the flag."""
    with pytest.raises(ValueError, match="use_model_tokenizer"):
        check_args(ExperimentConfig(
            exp_name="tok", datasets=["MedicalAbstracts", "MedicalAbstracts"],
            modalities=["txt", "txt"], use_model_tokenizer=True,
            model_name="mome_small_patch16"))


def test_dist_flags_must_be_set_together():
    """Multi-host DCN flags (main.py -> jax.distributed.initialize) are
    all-or-nothing; partial settings fail loudly at check_args."""
    cfg = parse_args(["--exp_name", "d", "--datasets", "MedicalAbstracts",
                      "MedicalAbstracts", "--modalities", "txt",
                      "--dist_coordinator", "10.0.0.1:1234",
                      "--dist_num_processes", "2", "--dist_process_id", "0"])
    assert cfg.dist_coordinator == "10.0.0.1:1234"
    with pytest.raises(ValueError, match="together"):
        check_args(ExperimentConfig(
            exp_name="d", datasets=["MedicalAbstracts", "MedicalAbstracts"],
            modalities=["txt"], dist_coordinator="10.0.0.1:1234"))


def test_freeze_window_keys_on_modality_flag(tmp_path):
    """The freeze window compares client.modality — the per-dataset
    --modalities FLAG (ct/mic/pat/der for MedMNIST), not the task
    modality — against --freeze_modality (fedavgserver.py:493-498).
    A MedMNIST 'ct' population must freeze under --freeze_modality ct
    and must NOT freeze under --freeze_modality img (the task modality
    its loader actually produces)."""
    from fedcola_tpu.data.loaders import load_federated_data
    from fedcola_tpu.federation.server import create_server
    rng0 = np.random.RandomState(0)
    np.savez(tmp_path / "organcmnist.npz",
             train_images=rng0.randint(0, 255, (40, 28, 28), np.uint8),
             train_labels=rng0.randint(0, 11, (40, 1)),
             test_images=rng0.randint(0, 255, (10, 28, 28), np.uint8),
             test_labels=rng0.randint(0, 11, (10, 1)))

    def server_for(freeze_modality):
        cfg = check_args(ExperimentConfig(
            exp_name="fz", multi_task=True,
            datasets=["MedMNIST", "MedMNIST"], modalities=["ct", "ct"],
            Ks=[2], data_path=str(tmp_path), test_size=-1,
            split_type="iid", reduce_samples=-1, synthetic_data=False,
            model_name="mome_test_patch16_32", use_pallas=False,
            compute_dtype="float32", shared_param="attn",
            share_scope="all", freeze_modality=freeze_modality,
            freeze_rounds=2, warmup_rounds=0))
        data = load_federated_data(cfg, np.random.RandomState(cfg.seed))
        srv = create_server(cfg, data)
        srv.round = 1  # inside (warmup, warmup+freeze]
        return srv

    srv = server_for("ct")
    token = srv._frozen_token("MedMNIST")
    assert token, "ct flag population must freeze under --freeze_modality ct"
    srv.round = 3  # past the window
    assert srv._frozen_token("MedMNIST") is None

    srv = server_for("img")
    assert srv._frozen_token("MedMNIST") is None, (
        "task modality must not match: the reference compares the flag")
