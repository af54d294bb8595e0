"""Golden tests of dataset parsers against the ACTUAL reference modules,
driven on the REAL data files shipped in the reference tree.

`medabstracts.py` (pandas/torch) and `flickr30k.py` (pandas/PIL) import
cleanly here; coco.py/torchtextparser.py/medmnist.py need
torchvision/pycocotools/torchtext/medmnist which are not installed (their
parity is covered by behavioral tests against the source).
"""

import importlib.util
import os

import numpy as np
import pytest

REF_DS = "/root/reference/src/datasets"
REF_DATA = "/root/reference/data"


def _load(fname, modname):
    path = os.path.join(REF_DS, fname)
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _IdTokenizer:
    """Tokenizer stand-in: our fetch_* APIs take a tokenizer; keep raw
    lengths only (the golden compares labels/ids/row alignment, tokenizer
    parity is covered by tests/test_tokenizer.py)."""

    def encode_batch(self, texts, seq_len):
        return np.zeros((len(texts), seq_len), np.int32)


def test_medabstracts_matches_reference_on_real_csv():
    """Same rows, same min-shifted labels (medabstracts.py:18-23) from the
    REAL medical_tc_test.csv."""
    root = os.path.join(REF_DATA, "medabstract")
    if not os.path.exists(os.path.join(root, "medical_tc_test.csv")):
        pytest.skip("reference data not mounted")
    ref_mod = _load("medabstracts.py", "ref_medabstracts")
    ref = ref_mod.MedicalAbstracts(root, is_train=False)

    from fedcola_tpu.data.datasets import fetch_medabstracts
    ours = fetch_medabstracts(root, train=False, tokenizer=_IdTokenizer())
    assert ours.n == len(ref)
    np.testing.assert_array_equal(ours.targets, ref.targets)
    assert ours.targets.min() == 0


def test_flickr30k_matches_reference_on_real_csv():
    """Same caption-row order, image-name alignment, and index//5 image
    ids (flickr30k.py:9-45) from the REAL test.csv/train.csv."""
    root = os.path.join(REF_DATA, "flickr30k")
    if not os.path.exists(os.path.join(root, "test.csv")):
        pytest.skip("reference data not mounted")
    ref_mod = _load("flickr30k.py", "ref_flickr30k")

    from fedcola_tpu.data.datasets import fetch_flickr30k
    for split, train in (("test", False), ("train", True)):
        ref = ref_mod.Flickr30kCap(root, split=split)
        ours = fetch_flickr30k(root, train=train, tokenizer=_IdTokenizer())
        assert ours.n == len(ref), split
        ref_names = [str(x) for x in ref.images]
        our_names = [os.path.basename(p) for p in ours.image_paths]
        assert our_names == ref_names, split
        np.testing.assert_array_equal(ours.image_ids,
                                      np.arange(len(ref)) // 5)
