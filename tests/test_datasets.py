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
