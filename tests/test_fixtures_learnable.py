"""The cls-leg fixtures must carry a real class signal (VERDICT r4,
missing item 3): the random-label synthetic stand-ins are at chance BY
CONSTRUCTION, so a silent bug in the img-cls/txt-cls train or eval path
could never be caught by evidence runs.  These tests pin that

1. the CIFAR100/AG_NEWS fixtures written by ``fedcola_tpu.data.fixtures``
   parse through the REAL production parsers (``fetch_cifar100``,
   ``fetch_torchtext_generic``) and are separable by trivial classifiers
   (nearest class mean / bag-of-words) — i.e. the signal exists;
2. the full federated img-cls path (server, resident gather, central
   eval) learns the CIFAR fixture well above chance end-to-end.
"""

import numpy as np
import pytest

from fedcola_tpu.data.fixtures import agnews_fixture, cifar100_fixture


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    return cifar100_fixture(str(tmp_path_factory.mktemp("cifar_fx")),
                            n_train=2000, n_test=400, n_classes=20)


@pytest.fixture(scope="module")
def agnews_root(tmp_path_factory):
    return agnews_fixture(str(tmp_path_factory.mktemp("agnews_fx")),
                          n_train=2000, n_test=400)


def test_cifar100_fixture_learnable_by_nearest_mean(cifar_root):
    from fedcola_tpu.data.datasets import fetch_cifar100
    train = fetch_cifar100(cifar_root, True)
    test = fetch_cifar100(cifar_root, False)
    assert train.n == 2000 and test.n == 400
    assert train.images.shape == (2000, 32, 32, 3)
    # balanced-ish classes, only the first 20 populated
    assert set(np.unique(train.targets)) == set(range(20))
    x_tr = train.images.reshape(train.n, -1).astype(np.float32)
    x_te = test.images.reshape(test.n, -1).astype(np.float32)
    means = np.stack([x_tr[train.targets == c].mean(0) for c in range(20)])
    pred = np.argmin(
        ((x_te[:, None, :] - means[None]) ** 2).sum(-1), axis=1)
    acc = float(np.mean(pred == test.targets))
    assert acc > 0.8, f"nearest-class-mean acc {acc} (chance 0.05)"


def test_medmnist_fixture_learnable_by_nearest_mean(tmp_path):
    from fedcola_tpu.data.datasets import fetch_medmnist
    from fedcola_tpu.data.fixtures import medmnist_fixture
    root = medmnist_fixture(str(tmp_path / "med_fx"), 800, 220)
    # through the REAL npz reader, via the ct->organcmnist flag map
    train = fetch_medmnist(root, True, modality_flag="ct")
    test = fetch_medmnist(root, False, modality_flag="ct")
    assert train.images.shape == (800, 28, 28, 1)
    assert set(np.unique(train.targets)) == set(range(11))
    x_tr = train.images.reshape(train.n, -1).astype(np.float32)
    x_te = test.images.reshape(test.n, -1).astype(np.float32)
    means = np.stack([x_tr[train.targets == c].mean(0) for c in range(11)])
    pred = np.argmin(((x_te[:, None, :] - means[None]) ** 2).sum(-1), axis=1)
    acc = float(np.mean(pred == test.targets))
    assert acc > 0.9, f"nearest-class-mean acc {acc} (chance 0.091)"


def test_agnews_fixture_learnable_by_bow(agnews_root):
    from fedcola_tpu.data.torchtext import fetch_torchtext_generic
    train = fetch_torchtext_generic("AG_NEWS", agnews_root, True, seq_len=24)
    test = fetch_torchtext_generic("AG_NEWS", agnews_root, False, seq_len=24)
    assert train.num_classes == 4
    assert set(np.unique(train.targets)) == set(range(4))
    V = int(max(train.texts.max(), test.texts.max())) + 1
    counts = np.ones((4, V))                       # Laplace smoothing
    for ids, y in zip(train.texts, train.targets):
        np.add.at(counts[y], ids[ids > 1], 1)      # skip <pad>/<unk>
    logp = np.log(counts / counts.sum(1, keepdims=True))
    scores = np.stack([logp[c][test.texts].sum(1) for c in range(4)], 1)
    # pads score equally across classes; signal words dominate
    acc = float(np.mean(np.argmax(scores, 1) == test.targets))
    assert acc > 0.9, f"bag-of-words acc {acc} (chance 0.25)"


def test_agnews_fixture_words_survive_wordpiece(agnews_root):
    """--use_bert_tokenizer path: the fixture vocab.txt must tokenize
    every signature/filler word whole (an [UNK] collapse would silently
    destroy the class signal, like the caption-code lesson in
    fixtures._vocab)."""
    from fedcola_tpu.data.tokenizer import get_tokenizer
    tok = get_tokenizer(data_path=agnews_root, dataset="AG_NEWS")
    ids = tok.encode("sig00 sig37 the market", max_length=8)
    assert tok.unk_id not in ids.tolist()


def test_fl_learns_cifar_fixture_end_to_end(tmp_path):
    """The full img-cls path — pickle parse, diri-compatible targets,
    resident staging, batched client updates, aggregation, central eval —
    must climb well above chance on the learnable fixture."""
    from fedcola_tpu.config import ExperimentConfig, check_args
    from fedcola_tpu.data.loaders import load_federated_data
    from fedcola_tpu.federation.server import create_server

    root = cifar100_fixture(str(tmp_path / "cifar_e2e"),
                            n_train=600, n_test=200, n_classes=5)
    cfg = check_args(ExperimentConfig(
        exp_name="learn_cifar", seed=11, multi_task=True,
        datasets=["CIFAR100", "CIFAR100"], modalities=["img", "img"],
        data_paths=[root, root], Ks=[2], Cs=[1.0], K=2,
        R=4, E=3, B=32, eval_batch_size=64, optimizer="AdamW", lr=1e-3,
        criterion="CrossEntropyLoss", eval_type="global",
        model_name="mome_test_patch16_32", resize=32,
        split_type="iid", use_pallas=False, compute_dtype="float32",
        equal_sampled=True, train_chunk_steps=8, test_size=-1,
        mesh_shape=[1]))
    data = load_federated_data(cfg, np.random.RandomState(0))
    assert data.server_eval["CIFAR100"].n == 200
    server = create_server(cfg, data)
    for r in range(1, cfg.R + 1):
        server.round = r
        server.update()
    server.evaluate([])
    acc = server.results[cfg.R]["server_evaluated_CIFAR100"][
        "metrics"]["acc1"]
    # 5 populated classes on a 100-way head: chance 0.01, majority 0.2
    assert acc > 0.35, f"img-cls e2e failed to learn (acc1={acc})"
