"""Does federated training actually learn?  A tiny text-classification task
whose labels are a deterministic function of the tokens must climb well
above chance within a few rounds."""

import numpy as np
import pytest

from fedcola_tpu.config import ExperimentConfig, check_args
from fedcola_tpu.data.datasets import TaskDataset
from fedcola_tpu.data.loaders import load_federated_data
from fedcola_tpu.federation.server import create_server


def _learnable_text_dataset(n, seq_len, vocab, nc, seed):
    rng = np.random.RandomState(seed)
    ids = rng.randint(5, vocab, (n, seq_len)).astype(np.int32)
    ids[:, 0] = 2
    y = (ids[:, 1] % nc).astype(np.int64)      # label = second token mod nc
    return TaskDataset(name="MedicalAbstracts", task="cls", modality="txt",
                       num_classes=nc, n=n, texts=ids, targets=y)


def test_fl_learns_synthetic_rule():
    cfg = check_args(ExperimentConfig(
        exp_name="learn", seed=11, multi_task=True,
        datasets=["MedicalAbstracts", "MedicalAbstracts"],
        modalities=["txt", "txt"], Ks=[2], Cs=[1.0], K=2,
        R=5, E=3, B=32, eval_batch_size=64, optimizer="AdamW", lr=1e-2,
        criterion="CrossEntropyLoss", eval_type="global",
        model_name="mome_test_patch16_32", seq_len=8,
        split_type="iid", synthetic_data=True, use_pallas=False,
        compute_dtype="float32", equal_sampled=True,
        train_chunk_steps=8, resize=32, vocab_size=40, mesh_shape=[1]))
    data = load_federated_data(cfg, np.random.RandomState(0))
    # swap in the learnable task (same structure as the synthetic fetch)
    nc = 5
    train = _learnable_text_dataset(512, 8, 40, nc, seed=1)
    test = _learnable_text_dataset(128, 8, 40, nc, seed=2)
    for shard in data.client_shards:
        shard.dataset = train
    half = 256
    data.client_shards[0].indices = np.arange(half)
    data.client_shards[1].indices = np.arange(half, 512)
    for meta in data.client_meta.values():
        object.__setattr__(meta, "n_train", half)
    data.server_eval["MedicalAbstracts"] = test

    server = create_server(cfg, data)
    for r in range(1, cfg.R + 1):
        server.round = r
        server.update()
    server.evaluate([])
    acc = server.results[cfg.R]["server_evaluated_MedicalAbstracts"][
        "metrics"]["acc1"]
    assert acc > 0.45, f"federated training failed to learn (acc1={acc})"


def _learnable_rtv_dataset(codes, vocab, img_hw, seed):
    """Retrieval task with a learnable cross-modal rule: each image is a
    fixed random pixel pattern determined by a code, and every one of its
    5 captions carries that code as a token — contrastive training must
    align the two towers on the code.  Evaluation uses SEEN codes with
    fresh caption noise (a convergence check, like the reference's own
    training-recall climbing — unseen codes would mean untrained token
    embeddings)."""
    rng = np.random.RandomState(seed)
    n_img = len(codes)
    n = n_img * 5
    texts = rng.randint(5, vocab, (n, seq_len := 8)).astype(np.int32)
    texts[:, 0] = 2
    texts[:, 1] = np.repeat(codes, 5)
    imgs = np.stack([np.random.RandomState(1000 + c)
                     .randint(0, 256, (img_hw, img_hw, 3)).astype(np.uint8)
                     for c in codes])
    ds = TaskDataset(name="Coco", task="rtv", modality="img+txt",
                     num_classes=None, n=n, texts=texts, targets=texts,
                     images=imgs[np.arange(n) // 5],
                     image_ids=np.arange(n) // 5, ann_ids=np.arange(n))
    return ds


@pytest.mark.slow
def test_fl_learns_synthetic_retrieval():
    """Multi-round federated contrastive training on the mm (img+txt)
    group must push retrieval R@1 far above chance — the convergence
    analog of the classification learnability test, on the flagship
    (retrieval) task."""
    vocab = 64
    cfg = check_args(ExperimentConfig(
        exp_name="learn_rtv", seed=5, multi_task=True,
        datasets=["Coco", "Coco"], modalities=["img+txt", "img+txt"],
        Ks=[2], Cs=[1.0], K=2,
        R=18, E=3, B=16, eval_batch_size=64, optimizer="AdamW", lr=1e-3,
        criterion="CrossEntropyLoss", eval_type="global",
        model_name="mome_test16_patch16_32", seq_len=8,
        split_type="iid", synthetic_data=True, use_pallas=False,
        compute_dtype="float32", equal_sampled=True,
        train_chunk_steps=8, resize=32, vocab_size=vocab, mesh_shape=[1]))
    data = load_federated_data(cfg, np.random.RandomState(0))
    codes = np.random.RandomState(1).permutation(np.arange(5, vocab))[:40]
    train = _learnable_rtv_dataset(codes, vocab, 32, seed=1)
    test = _learnable_rtv_dataset(codes[:25], vocab, 32, seed=2)
    for shard in data.client_shards:
        shard.dataset = train
    data.client_shards[0].indices = np.arange(100)
    data.client_shards[1].indices = np.arange(100, 200)
    for meta in data.client_meta.values():
        object.__setattr__(meta, "n_train", 100)
    data.server_eval["Coco"] = test

    server = create_server(cfg, data)
    for r in range(1, cfg.R + 1):
        server.round = r
        server.update()
    server.evaluate([])
    ev = server.results[cfg.R]["server_evaluated_Coco"]
    r1 = ev["Coco 5k_r@1sum"]          # i2t + t2i R@1 on the full gallery
    # chance: 1/25 per direction -> r@1sum ~ 0.08
    assert r1 > 0.6, f"contrastive FL failed to learn retrieval (r@1sum={r1})"


def test_perlayer_io_matches_stacked_exactly():
    """perlayer_io (chunk-internal per-layer param representation) is pure
    data movement: the trained params, moments, and per-step losses must
    equal the stacked path bit-for-bit on CPU (same math, same order)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fedcola_tpu.models.mat import MATConfig, init_mat
    from fedcola_tpu.parallel.client_update import (GroupSpec,
                                                    build_group_update)
    from fedcola_tpu.parallel.optim import OptimizerSpec, init_opt_state

    base = dict(modalities=(None, "txt"), tasks=(None, "cls"),
                num_classes=(None, 5), embed_dim=8, depth=3, num_heads=2,
                vocab_size=30, max_text_len=6, img_size=32,
                drop_path_rate=0.0, use_pallas=False,
                compute_dtype="float32", with_aux=True, aux_trained=False)
    spec = GroupSpec(modality="txt", criterion="CrossEntropyLoss")
    ospec = OptimizerSpec(name="AdamW", weight_decay=0.01)
    rng = np.random.RandomState(3)
    n, S, B = 2, 4, 4
    chunk = {
        "x": rng.randint(0, 30, (n, S, B, 6)).astype(np.int32),
        "y": rng.randint(0, 5, (n, S, B)).astype(np.int32),
        "valid": np.ones((n, S, B), bool),
        "step_valid": np.ones((n, S), bool),
    }
    outs = {}
    for mode in (False, True):
        cfg = MATConfig(perlayer_io=mode, **base)
        params = init_mat(cfg, jax.random.PRNGKey(0))
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (n,) + x.shape) + 0, params)
        ostate = init_opt_state(ospec, stacked, n)
        update = build_group_update(cfg, spec, ospec, None)
        rngs = jax.random.split(jax.random.PRNGKey(1), n)
        p, st, (loss, _, _) = update(stacked, ostate, chunk, rngs,
                                     jnp.float32(1e-3), params)
        outs[mode] = (jax.tree_util.tree_map(np.asarray, p),
                      jax.tree_util.tree_map(np.asarray, st),
                      np.asarray(loss))
    flat_a = jax.tree_util.tree_leaves(outs[False])
    flat_b = jax.tree_util.tree_leaves(outs[True])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)
