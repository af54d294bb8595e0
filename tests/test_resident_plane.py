"""HBM-resident data plane for path-backed (COCO/Flickr-shaped) datasets.

The flagship scripts' retrieval data is path-backed: loaders materialize it
into a deduped unique-image store + caption->image row map
(datasets.py:103-129).  The resident plane must stage that store and
gather ``store[row[idx]]`` on device, producing EXACTLY the training and
eval results of the host-fed pixel path (reference hot path being
replaced: per-sample DataLoader decode, fedavgclient.py:44-53).
"""

import os

import numpy as np
import pytest

from fedcola_tpu.config import ExperimentConfig, check_args
from fedcola_tpu.data.datasets import TaskDataset
from fedcola_tpu.data.loaders import FederatedData
from fedcola_tpu.data.pipeline import ClientShard
from fedcola_tpu.federation.aggregate import ClientMeta
from fedcola_tpu.federation.server import FedAvgServer


def _write_pathbacked_rtv(tmp_path, name, n_img, size=16, seed=0):
    """COCO-shaped fixture on disk: n_img PNGs, 5 captions each."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    paths = []
    for i in range(n_img):
        arr = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
        p = tmp_path / f"{name}_{i}.png"
        Image.fromarray(arr).save(str(p))
        paths.append(str(p))
    n = n_img * 5
    texts = rng.randint(5, 120, (n, 8)).astype(np.int32)
    texts[:, 0] = 2
    return TaskDataset(
        name="Coco", task="rtv", modality="img+txt", num_classes=None,
        n=n, texts=texts, targets=texts,
        image_paths=[paths[i // 5] for i in range(n)], image_size=size,
        image_ids=np.arange(n) // 5, ann_ids=np.arange(n))


def _cfg():
    return check_args(ExperimentConfig(
        exp_name="resident_test", seed=11, multi_task=True,
        datasets=["Coco", "Coco"], modalities=["img+txt", "img+txt"],
        Ks=[2], Cs=[1.0], K=2, R=1, E=1, B=8, eval_batch_size=16,
        optimizer="AdamW", lr=1e-3, criterion="CrossEntropyLoss",
        eval_type="global", model_name="mome_test_patch16_32", seq_len=8,
        split_type="iid", use_pallas=False, compute_dtype="float32",
        equal_sampled=True, train_chunk_steps=4, resize=32, vocab_size=120,
        mesh_shape=[1]))


def _data(tmp_path):
    train = _write_pathbacked_rtv(tmp_path, "tr", n_img=6, seed=0)
    test = _write_pathbacked_rtv(tmp_path, "te", n_img=5, seed=1)
    assert train.materialize_images() and test.materialize_images()
    out = FederatedData()
    out.server_eval["Coco"] = test
    for k, idx in enumerate((np.arange(0, 15), np.arange(15, 30))):
        out.client_shards.append(ClientShard(dataset=train, indices=idx))
        out.client_meta[k] = ClientMeta(id=k, dataset="Coco",
                                        modality="img+txt", task="rtv",
                                        n_train=len(idx))
    return out


def _run_round(tmp_path, budget):
    old = os.environ.get("FEDCOLA_RESIDENT_BUDGET")
    os.environ["FEDCOLA_RESIDENT_BUDGET"] = str(budget)
    try:
        server = FedAvgServer(_cfg(), _data(tmp_path))
        server.round = 1
        server.update()
        server.evaluate([])
        return server
    finally:
        if old is None:
            del os.environ["FEDCOLA_RESIDENT_BUDGET"]
        else:
            os.environ["FEDCOLA_RESIDENT_BUDGET"] = old


def test_pathbacked_goes_resident_and_matches_hostfed(tmp_path):
    resident = _run_round(tmp_path, 6 * 1024 ** 3)
    hostfed = _run_round(tmp_path, 0)          # budget 0 -> host pixels

    # the flagship config actually engaged the resident plane, with the
    # deduped store + row indirection (not per-caption rows)
    staged = resident._resident_cache["Coco"]
    assert staged is not None and "img_store" in staged
    assert staged["img_store"].shape[0] == 6          # unique images
    assert staged["img_row"].shape[0] == 30           # caption rows
    assert resident._resident_cache["eval:Coco"] is not None
    assert hostfed._resident_cache["Coco"] is None    # fallback ran host-fed

    # training is numerically identical to the host-fed pixel path
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(resident.global_params["Coco"]),
                    jax.tree_util.tree_leaves(hostfed.global_params["Coco"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    # and so is retrieval eval
    ev_r = resident.results[1]["server_evaluated_Coco"]
    ev_h = hostfed.results[1]["server_evaluated_Coco"]
    assert ev_r.keys() == ev_h.keys()
    for k in ev_r:
        assert ev_r[k] == pytest.approx(ev_h[k], abs=1e-6), k


# ------------------------------------------------- device augmentation -----

def test_device_augment_matches_host_semantics():
    """device_augment (resident-plane crop/flips) reproduces the host
    ``_augment`` semantics (pipeline.py:108-136): p=1 flips are exact
    mirrors, p=0 is identity, and every random crop is a c x c window of
    the 4-padded input."""
    import jax
    import jax.numpy as jnp
    from fedcola_tpu.parallel.client_update import device_augment

    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (6, 16, 16, 3)).astype(np.uint8)
    key = jax.random.PRNGKey(0)

    out = device_augment(jnp.asarray(x), key, None, 1.0, None)
    np.testing.assert_array_equal(np.asarray(out), x[:, :, ::-1, :])
    out = device_augment(jnp.asarray(x), key, None, None, 1.0)
    np.testing.assert_array_equal(np.asarray(out), x[:, ::-1, :, :])
    out = device_augment(jnp.asarray(x), key, None, 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(out), x)

    c = 16
    out = np.asarray(device_augment(jnp.asarray(x), key, c, None, None))
    assert out.shape == (6, c, c, 3)
    padded = np.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    for i in range(6):
        windows = [padded[i, y:y + c, xx:xx + c]
                   for y in range(9) for xx in range(9)]
        assert any(np.array_equal(out[i], w) for w in windows), i
    # crops actually vary across samples (per-sample randomness)
    assert not all(np.array_equal(out[i], out[0]) for i in range(6))


def test_flip_augmented_run_keeps_residency(tmp_path):
    """--randhf/--randvf/--crop no longer evict the group from the
    resident plane (round-2 VERDICT missing #2): the run stays
    index-fed and trains with device-side augmentation."""
    import dataclasses
    os.environ["FEDCOLA_RESIDENT_BUDGET"] = str(6 * 1024 ** 3)
    try:
        cfg = dataclasses.replace(_cfg(), randhf=0.5, randvf=0.5)
        server = FedAvgServer(cfg, _data(tmp_path))
        server.round = 1
        server.update()
        assert server._resident_cache["Coco"] is not None
        loss = server.results[1]["clients_updated_summary"]["loss"]["avg"]
        assert np.isfinite(loss)
    finally:
        del os.environ["FEDCOLA_RESIDENT_BUDGET"]


def test_rotation_falls_back_to_host(tmp_path):
    """Rotation/jitter stay host-side: the group runs host-fed (with the
    host _augment chain) and still trains."""
    import dataclasses
    cfg = dataclasses.replace(_cfg(), randrot=15)
    server = FedAvgServer(cfg, _data(tmp_path))
    server.round = 1
    server.update()
    # resident staging was never attempted for the train set
    assert "Coco" not in server._resident_cache
    loss = server.results[1]["clients_updated_summary"]["loss"]["avg"]
    assert np.isfinite(loss)


def test_resident_budget_is_one_ledger(tmp_path, monkeypatch):
    """FEDCOLA_RESIDENT_BUDGET bounds TOTAL pinned staging across all
    consumers: once the train arrays consume most of it, the eval staging
    must fall back to host feeding instead of re-checking the full budget
    in isolation — and eval still works host-fed."""
    server = FedAvgServer(_cfg(), _data(tmp_path))
    spec = server._group_spec("Coco")
    train = server._train_dataset("Coco")
    train_bytes = (train._image_store.nbytes
                   + np.asarray(train._image_row, np.int32).nbytes
                   + np.asarray(train.texts, np.int32).nbytes)
    monkeypatch.setenv("FEDCOLA_RESIDENT_BUDGET", str(train_bytes + 64))
    assert server._resident_data("Coco", spec) is not None
    assert server.resident_budget_left() <= 64
    assert server._resident_eval_data("Coco", spec) is None  # over ledger
    server.round = 1
    server.update()
    server.evaluate([])
    assert "server_evaluated_Coco" in server.results[1]


def test_device_augment_resize_before_crop():
    """Device twin of the host resize-before-crop order: with resize=16
    and crop=24 the crop position is deterministic (padded == crop), so
    host and device agree up to the bilinear implementations (PIL vs
    jax.image.resize) — a linear ramp makes both exact."""
    import jax
    import numpy as np
    from fedcola_tpu.data.pipeline import AugmentSpec, _augment
    from fedcola_tpu.parallel.client_update import device_augment

    ramp = np.linspace(0, 248, 32, dtype=np.float32)
    imgs = np.broadcast_to(ramp[None, :, None, None],
                           (2, 32, 32, 3)).astype(np.uint8).copy()
    host = _augment(imgs.copy(), AugmentSpec(resize=16, crop=24),
                    np.random.RandomState(0))
    dev = np.asarray(device_augment(
        imgs, jax.random.PRNGKey(0), crop=24, randhf=None, randvf=None,
        resize=16))
    assert dev.shape == (2, 24, 24, 3)
    # bilinear of a vertical linear ramp is near-exact in both
    # implementations; allow 1 uint8 level of rounding slack
    assert np.abs(host.astype(int) - dev.astype(int)).max() <= 1


def test_device_augment_pad_if_needed():
    import jax
    import numpy as np
    from fedcola_tpu.parallel.client_update import device_augment

    imgs = np.full((2, 8, 8, 3), 200, dtype=np.uint8)
    out = np.asarray(device_augment(imgs, jax.random.PRNGKey(0), crop=32,
                                    randhf=None, randvf=None))
    assert out.shape == (2, 32, 32, 3)
    assert (out == 200).any() and (out == 0).any()


def test_preprocess_center_crop_eval_path():
    """--crop at eval: preprocess_images applies the reference's
    deterministic Resize -> CenterCrop to raw (non-crop-sized) images and
    leaves already-cropped train batches untouched (data.py:93-97)."""
    import jax.numpy as jnp
    import jax
    import numpy as np
    from fedcola_tpu.parallel.client_update import GroupSpec, \
        preprocess_images

    spec = GroupSpec(modality="img", criterion="CrossEntropyLoss",
                     imnorm=False, aug_resize=16, center_crop=8)
    raw = np.random.RandomState(0).randint(
        0, 255, (2, 12, 12, 3), dtype=np.uint8)
    out = np.asarray(preprocess_images(jnp.asarray(raw), spec,
                                       jnp.float32))
    assert out.shape == (2, 8, 8, 3)
    # golden: resize 12->16 in float pixel space, center-crop 8
    ref = jax.image.resize(jnp.asarray(raw, jnp.float32) / 255.0,
                           (2, 16, 16, 3), "bilinear")[:, 4:12, 4:12, :]
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-5, atol=1e-6)

    # train batch already crop-sized: untouched by the eval chain
    pre = np.random.RandomState(1).randint(
        0, 255, (2, 8, 8, 3), dtype=np.uint8)
    out2 = np.asarray(preprocess_images(jnp.asarray(pre), spec,
                                        jnp.float32))
    np.testing.assert_allclose(out2, pre.astype(np.float32) / 255.0,
                               rtol=1e-6, atol=1e-7)
