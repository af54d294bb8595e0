"""Dataset reader tests: real reference CSVs where mounted, path-backed
image materialization, splits."""

import os

import numpy as np
import pytest

from fedcola_tpu.data.datasets import (TaskDataset, fetch_flickr30k,
                                       fetch_medabstracts, fetch_synthetic)
from fedcola_tpu.data.splits import simulate_split
from fedcola_tpu.data.tokenizer import WordPieceTokenizer, get_tokenizer

MED_ROOT = "/root/reference/data/medabstract"
FLICKR_ROOT = "/root/reference/data/flickr30k"


@pytest.mark.skipif(not os.path.exists(MED_ROOT), reason="no reference data")
def test_medabstracts_real_csv():
    tok = get_tokenizer(data_path=MED_ROOT, dataset="MedicalAbstracts")
    assert tok.vocab_size == 20264   # fedavgserver.py:89-92
    ds = fetch_medabstracts(MED_ROOT, train=False, tokenizer=tok, seq_len=40)
    assert ds.num_classes == 5
    assert ds.targets.min() == 0     # labels shifted to 0-base
    assert ds.texts.shape == (ds.n, 40)
    assert ds.texts[:, 0].max() == tok.cls_id


@pytest.mark.skipif(not os.path.exists(FLICKR_ROOT), reason="no reference data")
def test_flickr_csv_structure():
    tok = get_tokenizer(data_path=FLICKR_ROOT, dataset="Flickr30k")
    assert tok.vocab_size == 7732
    ds = fetch_flickr30k(FLICKR_ROOT, train=True, tokenizer=tok, seq_len=40)
    # 5 captions per image (flickr30k.py invariant)
    assert ds.n % 5 == 0
    assert (ds.image_ids == np.arange(ds.n) // 5).all()
    assert ds.n_images == ds.n // 5


def test_materialize_images_roundtrip(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        arr = rng.randint(0, 255, (50, 40, 3), np.uint8)
        p = tmp_path / f"im{i % 3}.png"      # repeated paths (5-captions case)
        if not p.exists():
            Image.fromarray(arr).save(p)
        paths.append(str(p))
    ds = TaskDataset(name="X", task="rtv", modality="img+txt",
                     num_classes=None, n=6, image_paths=paths, image_size=32)
    lazy = ds.load_images(np.array([0, 3, 5]))
    assert ds.materialize_images()
    fast = ds.load_images(np.array([0, 3, 5]))
    np.testing.assert_array_equal(lazy, fast)
    assert ds._image_store.shape[0] == 3     # deduped storage


def test_caption_grouped_split():
    rng = np.random.RandomState(0)
    split = simulate_split("diri", 100, 4, rng, caption_grouped=True)
    for k, idx in split.items():
        idx = np.asarray(idx)
        assert len(idx) % 5 == 0
        groups = idx.reshape(-1, 5)
        np.testing.assert_array_equal(groups % 5,
                                      np.tile(np.arange(5), (len(groups), 1)))


def test_diri_split_min_size():
    rng = np.random.RandomState(0)
    targets = np.repeat(np.arange(5), 100)
    split = simulate_split("diri", 500, 5, rng, targets=targets,
                           num_classes=5, cncntrtn=0.5)
    assert min(len(v) for v in split.values()) >= 10
    assert sum(len(v) for v in split.values()) == 500


# ------------------------------------------------------- torchtext generic --

def _write_fastai_csv(path, rows):
    import csv as _csv
    with open(path, "w", newline="", encoding="utf8") as f:
        w = _csv.writer(f)
        w.writerows(rows)


def test_basic_english_tokenizer_semantics():
    """torchtext basic_english parity on its documented substitutions."""
    from fedcola_tpu.data.torchtext import basic_english_tokenize
    assert basic_english_tokenize("You can now install TorchText using pip!") \
        == ["you", "can", "now", "install", "torchtext", "using", "pip", "!"]
    assert basic_english_tokenize('He said: "don\'t go." <br /> Why; not?') \
        == ["he", "said", "don", "'", "t", "go", ".", "why", "not", "?"]
    assert basic_english_tokenize("A, (b) c!") == \
        ["a", ",", "(", "b", ")", "c", "!"]


def test_torchtext_generic_agnews(tmp_path):
    from fedcola_tpu.data.torchtext import (build_vocab,
                                            fetch_torchtext_generic)
    root = tmp_path / "ag"
    root.mkdir()
    _write_fastai_csv(root / "train.csv", [
        [1, "World news", "the war the war report"],
        [2, "Sports news", "the match was won"],
        [3, "Business", "the market the market"],
        [4, "SciTech", "new chip ships"],
    ])
    _write_fastai_csv(root / "test.csv", [
        [1, "World", "war report arrives"],
        [4, "SciTech", "unseen wordhere"],
    ])
    tr = fetch_torchtext_generic("AG_NEWS", str(root), True, seq_len=6)
    te = fetch_torchtext_generic("AG_NEWS", str(root), False, seq_len=6)
    assert tr.num_classes == 4 and tr.task == "cls" and tr.modality == "txt"
    assert tr.targets.tolist() == [0, 1, 2, 3]      # 1-based -> 0-based
    assert tr.texts.shape == (4, 6) and te.texts.shape == (2, 6)
    # vocab: pad=0, unk=1, then frequency-descending ('the' is most common)
    vocab = build_vocab([["the", "war", "the", "news"], ["the"]])
    assert vocab["<pad>"] == 0 and vocab["<unk>"] == 1 and vocab["the"] == 2
    # unseen test tokens -> unk, shared train vocab
    assert (te.texts[1] == 1).any()
    # padding fills with pad id 0
    assert (tr.texts[3] == 0).sum() >= 1
    # npz cache written with the reference's names and reused
    assert (root / "tr_6.npz").exists() and (root / "te_6.npz").exists()
    z = np.load(root / "tr_6.npz", allow_pickle=True)
    # reference layout (positional arr_0/arr_1 stay readable by the
    # reference's own loader) + our num_embeddings stamp for staleness
    assert {"arr_0", "arr_1"} <= set(z.files)
    tr2 = fetch_torchtext_generic("AG_NEWS", str(root), True, seq_len=6)
    np.testing.assert_array_equal(tr2.texts, tr.texts)
    # a different --num_embeddings must NOT reuse the stale cache
    tr3 = fetch_torchtext_generic("AG_NEWS", str(root), True, seq_len=6,
                                  num_embeddings=3)
    assert tr3.texts.max() <= 2 + 2   # pad/unk + 3 vocab rows


def test_torchtext_second_family_and_cap(tmp_path):
    """A second torchtext family (DBpedia, 14 classes) loads from local
    files; num_embeddings caps the vocab like torchtext max_tokens."""
    from fedcola_tpu.data.torchtext import fetch_torchtext_generic
    root = tmp_path / "db"
    root.mkdir()
    rows = [[(i % 14) + 1, f"title {i}", "alpha beta gamma delta " * (i + 1)]
            for i in range(14)]
    _write_fastai_csv(root / "train.csv", rows)
    _write_fastai_csv(root / "test.csv", rows[:3])
    tr = fetch_torchtext_generic("DBpedia", str(root), True, seq_len=8,
                                 num_embeddings=4)
    assert tr.num_classes == 14
    assert sorted(np.unique(tr.targets)) == list(range(14))
    # vocab capped at 4 (pad, unk + 3 most frequent... unk counts toward
    # the cap, pad does not) -> max id is 4
    assert tr.texts.max() <= 4


def test_coco_public_set_reference_layout(tmp_path):
    """CreamFL public set: annotations from pub_anno_path, ids =
    coco_train_ids[-n:] found two levels above it, images from pub_data_dir
    (creamflserver.py:100-126)."""
    import json as _json
    from fedcola_tpu.data.datasets import fetch_coco_public
    from fedcola_tpu.data.tokenizer import WordPieceTokenizer
    coco = tmp_path / "coco"
    (coco / "annotations").mkdir(parents=True)
    (coco / "all_images").mkdir()
    anns = [{"id": 100 + i, "image_id": i // 2,
             "caption": f"a photo number {i}"} for i in range(10)]
    imgs = [{"id": j, "file_name": f"img{j}.jpg"} for j in range(5)]
    (coco / "annotations" / "captions_train2014.json").write_text(
        _json.dumps({"annotations": anns, "images": imgs}))
    np.save(coco / "coco_train_ids.npy",
            np.array([100 + i for i in range(10)]))
    tok = WordPieceTokenizer.synthetic(200)
    ds = fetch_coco_public(str(coco / "all_images"),
                           str(coco / "annotations" /
                               "captions_train2014.json"),
                           tok, seq_len=8, num_pub_samples=4)
    assert ds.n == 4
    np.testing.assert_array_equal(ds.ann_ids, [106, 107, 108, 109])
    assert ds.image_paths[0].endswith("all_images/img3.jpg")
    assert ds.texts.shape == (4, 8)


def test_fixture_generators_load_through_real_fetchers(tmp_path):
    """The shared path-backed fixtures (fedcola_tpu/data/fixtures.py) must
    parse through the real COCO/Flickr fetchers: correct 5-captions/image
    grouping, decodable jpegs, deduped materialization — these fixtures
    back the bench's path-backed figure and the evidence runs."""
    from fedcola_tpu.data.datasets import fetch_coco
    from fedcola_tpu.data.fixtures import coco_fixture, flickr_fixture

    croot = coco_fixture(str(tmp_path / "coco"), 4, 3, 24)
    tok = get_tokenizer(data_path=croot, dataset="Coco")
    # the fixture's vocab.txt must win over the fallback chain: with the
    # synthetic stand-in every caption is all-[UNK] and retrieval has no
    # signal (a run's learnability must not depend on whether a cached
    # bert vocab happens to exist on the machine)
    a = tok.encode("a photo number 1 caption 0 of several things", 12)
    b = tok.encode("a photo number 2 caption 0 of several things", 12)
    assert not (a == b).all()
    ds = fetch_coco(croot, train=True, tokenizer=tok, seq_len=12,
                    image_size=24)
    assert ds.n == 20 and ds.n_images == 4
    assert ds.materialize_images()
    assert ds._image_store.shape == (4, 24, 24, 3)

    # the fixture also writes coco_{train,test}_ids.npy holding exactly
    # each split's sorted annotation ids, so (a) fetch_coco selects the
    # SAME rows with the id files as without them, and (b) the CreamFL
    # public loader (creamflserver.py:107 recipe) resolves REAL fixture
    # captions instead of warning into the synthetic fallback
    import os as _os
    from fedcola_tpu.data.datasets import fetch_coco_public
    assert _os.path.exists(_os.path.join(croot, "coco_train_ids.npy"))
    _os.rename(_os.path.join(croot, "coco_train_ids.npy"),
               _os.path.join(croot, "ids.bak"))
    ds_noids = fetch_coco(croot, train=True, tokenizer=tok, seq_len=12,
                          image_size=24)
    _os.rename(_os.path.join(croot, "ids.bak"),
               _os.path.join(croot, "coco_train_ids.npy"))
    np.testing.assert_array_equal(ds.ann_ids, ds_noids.ann_ids)
    pub = fetch_coco_public(
        _os.path.join(croot, "all_images"),
        _os.path.join(croot, "annotations", "captions_train2014.json"),
        tok, seq_len=12, num_pub_samples=7)
    assert pub.n == 7
    np.testing.assert_array_equal(pub.ann_ids, ds.ann_ids[-7:])
    np.testing.assert_array_equal(pub.texts, ds.texts[-7:])
    # upgrade path: a fixture stamped before the id files existed gets
    # them on the next coco_fixture() call without a rebuild
    _os.remove(_os.path.join(croot, "coco_train_ids.npy"))
    assert coco_fixture(str(tmp_path / "coco"), 4, 3, 24) == croot
    assert _os.path.exists(_os.path.join(croot, "coco_train_ids.npy"))

    froot = flickr_fixture(str(tmp_path / "flickr"), 4, 3, 24)
    ftok = get_tokenizer(data_path=froot, dataset="Flickr30k")
    fds = fetch_flickr30k(froot, train=True, tokenizer=ftok, seq_len=12,
                          image_size=24)
    assert fds.n == 20 and (fds.image_ids == np.arange(20) // 5).all()
    assert fds.materialize_images()
    assert fds._image_store.shape == (4, 24, 24, 3)
    tds = fetch_flickr30k(froot, train=False, tokenizer=ftok, seq_len=12,
                          image_size=24)
    assert tds.n == 15
    # eval_overlap (default): the test split references the SAME images +
    # caption codes as train, so retrieval eval has a true (memorization)
    # target — recall climbs as training aligns the pairs
    assert tds.materialize_images()
    np.testing.assert_array_equal(tds._image_store, fds._image_store[:3])
    assert set(map(tuple, tds.texts.tolist())) \
        <= set(map(tuple, fds.texts.tolist()))

    # eval_overlap=False: fresh test images, disjoint caption codes
    # (timing-only fixture)
    droot = flickr_fixture(str(tmp_path / "flickr_d"), 4, 3, 24,
                           eval_overlap=False)
    dtok = get_tokenizer(data_path=droot, dataset="Flickr30k")
    dtr = fetch_flickr30k(droot, train=True, tokenizer=dtok, seq_len=12,
                          image_size=24)
    dte = fetch_flickr30k(droot, train=False, tokenizer=dtok, seq_len=12,
                          image_size=24)
    assert not set(map(tuple, dtr.texts.tolist())) \
        & set(map(tuple, dte.texts.tolist()))


def test_medmnist_flag_selection_and_scaling(tmp_path):
    """The modality flag selects the medmnist subset (ct/img -> organcmnist,
    reference medmnist.py:11-17), reduce_samples_cls_scale scales train only
    when reduce_samples is off (elif chain, medmnist.py:34-40), and
    num_classes comes from the INFO table, not the labels present."""
    from fedcola_tpu.data.datasets import (MEDMNIST_FLAGS, fetch_medmnist)
    rng = np.random.RandomState(0)
    # synthetic organcmnist: grayscale 28x28, 11 classes
    np.savez(tmp_path / "organcmnist.npz",
             train_images=rng.randint(0, 255, (40, 28, 28), np.uint8),
             train_labels=rng.randint(0, 11, (40, 1)),
             test_images=rng.randint(0, 255, (10, 28, 28), np.uint8),
             test_labels=rng.randint(0, 11, (10, 1)))
    # a decoy pathmnist so a wrong flag map would silently "work"
    np.savez(tmp_path / "pathmnist.npz",
             train_images=rng.randint(0, 255, (8, 28, 28, 3), np.uint8),
             train_labels=rng.randint(0, 9, (8, 1)),
             test_images=rng.randint(0, 255, (4, 28, 28, 3), np.uint8),
             test_labels=rng.randint(0, 9, (4, 1)))
    assert MEDMNIST_FLAGS["ct"] == "organcmnist"
    assert MEDMNIST_FLAGS["img"] == "organcmnist"
    for flag in ("ct", "img"):
        ds = fetch_medmnist(str(tmp_path), train=True, modality_flag=flag)
        assert ds.n == 40 and ds.images.shape == (40, 28, 28, 1)
        assert ds.modality == flag          # clients carry the FLAG
        assert ds.num_classes == 11         # INFO table, even if truncated
    # reduce_samples wins over the scale (elif)
    ds = fetch_medmnist(str(tmp_path), True, "ct", reduce_samples=5,
                        reduce_samples_cls_scale=0.5)
    assert ds.n == 5 and ds.num_classes == 11
    # scale fires only when reduce_samples <= 0; train only
    ds = fetch_medmnist(str(tmp_path), True, "ct", reduce_samples=-1,
                        reduce_samples_cls_scale=0.5)
    assert ds.n == 20
    te = fetch_medmnist(str(tmp_path), False, "ct", reduce_samples=5,
                        reduce_samples_cls_scale=0.5, reduce_test_samples=3)
    assert te.n == 3
    # pat still routes to pathmnist
    ds = fetch_medmnist(str(tmp_path), True, "pat")
    assert ds.n == 8 and ds.num_classes == 9 and ds.modality == "pat"


def test_medmnist_flag_threaded_from_modalities(tmp_path):
    """load_federated_data passes the dataset's --modalities entry into
    fetch_medmnist (reference data.py:295,400) and clients keep it as
    their modality (medmnist.py:47)."""
    from fedcola_tpu.config import check_args, ExperimentConfig
    from fedcola_tpu.data.loaders import load_federated_data
    rng0 = np.random.RandomState(0)
    np.savez(tmp_path / "organcmnist.npz",
             train_images=rng0.randint(0, 255, (40, 28, 28), np.uint8),
             train_labels=rng0.randint(0, 11, (40, 1)),
             test_images=rng0.randint(0, 255, (10, 28, 28), np.uint8),
             test_labels=rng0.randint(0, 11, (10, 1)))
    cfg = check_args(ExperimentConfig(
        multi_task=True, datasets=["MedMNIST", "MedMNIST"],
        modalities=["ct", "ct"], Ks=[2], data_path=str(tmp_path),
        test_size=-1, split_type="iid", reduce_samples=-1))
    data = load_federated_data(cfg, np.random.RandomState(cfg.seed))
    assert data.K == 2
    assert all(m.modality == "ct" for m in data.client_meta.values())
    assert data.server_eval["MedMNIST"].n == 10
    assert data.server_eval["MedMNIST"].num_classes == 11


def test_stratified_holdout_counts_match_reference(tmp_path):
    """Per-client cls holdout sizes: the reference's stratified_split takes
    round(len*test_size) PER CLASS (src/utils.py:168-179), not int()
    truncation (that is the retrieval/regression branch, data.py:147).
    Drive the REAL upstream function (utils.py loads standalone; its lazy
    .metrics import only fires inside MetricManager) and compare per-class
    test counts — memberships differ by RNG plumbing, counts must not."""
    import importlib.util
    import torch
    ref_utils_path = "/root/reference/src/utils.py"
    if not os.path.exists(ref_utils_path):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_utils_sd",
                                                  ref_utils_path)
    ref_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)

    rng = np.random.RandomState(3)
    # ragged class sizes chosen so round() != int() for several classes
    targets = np.concatenate([np.full(n, c) for c, n in
                              enumerate((7, 9, 11, 13, 5))])
    order = rng.permutation(len(targets))
    targets = targets[order]

    class _DS(torch.utils.data.Dataset):
        def __init__(self):
            self.targets = targets.tolist()

        def __len__(self):
            return len(targets)

        def __getitem__(self, i):
            return 0, self.targets[i]

    test_size = 0.3
    subset = torch.utils.data.Subset(_DS(), list(range(len(targets))))
    _, ref_test = ref_utils.stratified_split(subset, test_size)
    ref_counts = np.bincount(targets[np.asarray(ref_test.indices)],
                             minlength=5)

    # ours: the loaders.py cls-holdout recipe on the same targets
    split_rng = np.random.RandomState(11)
    idx = np.arange(len(targets))
    te_parts = []
    for c in np.unique(targets):
        cls_idx = split_rng.permutation(idx[targets == c])
        n_te = round(len(cls_idx) * test_size)
        te_parts.append(cls_idx[:n_te])
    our_counts = np.bincount(targets[np.concatenate(te_parts)], minlength=5)
    np.testing.assert_array_equal(our_counts, ref_counts)
    # the distinguishing case: int() truncation would give a different
    # total on these ragged sizes
    assert our_counts.sum() != sum(int(n * test_size)
                                   for n in (7, 9, 11, 13, 5))
