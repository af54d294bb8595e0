"""Golden tests of the retrieval evaluator against the ACTUAL reference
`/root/reference/src/metrics/eval_coco.py` (numpy/torch/tqdm only — all
present), same pattern as the split and metrics goldens: import the real
upstream module and drive both implementations with identical synthetic
features.

This pins the heart of the matched-R@1 claim: `_best_positive_ranks`'
vectorized double-argsort + masked-min equals the reference's per-query
`torch.where` scan (eval_coco.py:291-355), and `evaluate_n_fold`'s
searchsorted caption boundaries equal the reference's fixed
n_captions_per_crossfold slices at 5 captions/image (eval_coco.py:353-407).

Unit note: the reference's recall_at_k returns PERCENT (eval_coco.py:38-45);
ours returns fractions — the golden scales by 100.
"""

import importlib.util
import os

import numpy as np
import pytest
import torch

from fedcola_tpu.eval import retrieval as ours

REF_EVAL = "/root/reference/src/metrics/eval_coco.py"


@pytest.fixture(scope="module")
def ref_eval():
    if not os.path.exists(REF_EVAL):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_eval_coco", REF_EVAL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _evaluator(ref_eval):
    ev = ref_eval.COCOEvaluator(eval_method="matmul", extract_device="cpu",
                                eval_device="cpu")
    ev.n_embeddings = 1   # set_model() derives this from a model; single-
    # embedding matmul retrieval is the only path the reference runs
    return ev


def _features(rng, n_img=60, caps_per=5, d=16):
    """Unit-norm features in the grouped layout extract_features emits:
    captions sorted behind their image's first-seen position."""
    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    imf = unit(rng.randn(n_img, d)).astype(np.float32)
    capf = unit(rng.randn(n_img * caps_per, d)).astype(np.float32)
    img_cls = rng.permutation(n_img * 7)[:n_img].astype(np.int64)
    cap_cls = np.repeat(img_cls, caps_per)
    return imf, capf, img_cls, cap_cls


def test_evaluate_recall_matches_reference(ref_eval):
    rng = np.random.RandomState(41)
    imf, capf, img_cls, cap_cls = _features(rng)
    ev = _evaluator(ref_eval)
    for q, g, qc, gc, tag in [(imf, capf, img_cls, cap_cls, "i2t"),
                              (capf, imf, cap_cls, img_cls, "t2i")]:
        theirs = ev.evaluate_recall(torch.tensor(q), torch.tensor(g),
                                    qc, gc, batch_size=37)
        got = ours.evaluate_recall(q, g, qc, gc)
        for k in ("recall_1", "recall_5", "recall_10", "rsum"):
            np.testing.assert_allclose(got[k] * 100.0, theirs[k],
                                       rtol=1e-6, err_msg=f"{tag}:{k}")
        for k in ("medr", "meanr"):
            np.testing.assert_allclose(got[k], theirs[k], rtol=1e-6,
                                       err_msg=f"{tag}:{k}")


def test_evaluate_n_fold_matches_reference(ref_eval):
    """5 folds x 12 images x 60 captions: our searchsorted caption
    boundaries must reproduce the reference's fixed
    n_captions_per_crossfold slices exactly (5 captions/image)."""
    rng = np.random.RandomState(43)
    imf, capf, img_cls, cap_cls = _features(rng)
    ev = _evaluator(ref_eval)
    theirs = ev.evaluate_n_fold(
        {"image_features": torch.tensor(imf),
         "caption_features": torch.tensor(capf),
         "image_classes": img_cls, "caption_classes": cap_cls},
        n_crossfolds=5, n_images_per_crossfold=12,
        n_captions_per_crossfold=60, eval_batch_size=1024)
    got = ours.evaluate_n_fold(imf, capf, img_cls, cap_cls,
                               n_crossfolds=5, n_images_per_fold=12)
    for d in ("i2t", "t2i"):
        for k in ("recall_1", "recall_5", "recall_10", "rsum"):
            np.testing.assert_allclose(got[d][k] * 100.0, theirs[d][k],
                                       rtol=1e-6, err_msg=f"{d}:{k}")
        for k in ("medr", "meanr"):
            np.testing.assert_allclose(got[d][k], theirs[d][k], rtol=1e-6,
                                       err_msg=f"{d}:{k}")
