"""Retrieval evaluator unit tests: recall math on synthetic features with
known ranks (reference eval_coco.py:290-351 semantics)."""

import numpy as np
import pytest

from fedcola_tpu.eval.retrieval import evaluate_n_fold, evaluate_recall


def test_perfect_retrieval():
    """Identity features: every caption's image is rank 0."""
    n_img, d = 10, 8
    rng = np.random.RandomState(0)
    img = rng.randn(n_img, d).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    cap = np.repeat(img, 5, axis=0)          # 5 captions == their image
    img_cls = np.arange(n_img)
    cap_cls = np.repeat(img_cls, 5)
    s = evaluate_recall(img, cap, img_cls, cap_cls)
    assert s["recall_1"] == 1.0 and s["medr"] == 1.0
    s = evaluate_recall(cap, img, cap_cls, img_cls)
    assert s["recall_1"] == 1.0


def test_known_rank_structure():
    """Construct queries whose best positive sits at a known rank."""
    d = 4
    g = np.eye(d, dtype=np.float32)           # 4 gallery items
    g_cls = np.arange(4)
    # query 0 is closest to gallery 1 (wrong), second-closest to gallery 0
    q = np.array([[0.6, 0.8, 0.0, 0.0]], np.float32)
    q_cls = np.array([0])
    s = evaluate_recall(q, g, q_cls, g_cls)
    assert s["recall_1"] == 0.0 and s["recall_5"] == 1.0
    assert s["medr"] == 2.0  # best positive at rank index 1 -> medr 2


def test_n_fold_positional_slices():
    rng = np.random.RandomState(1)
    n_img = 10
    img = rng.randn(n_img, 8).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    cap = np.repeat(img, 5, axis=0)
    img_cls = np.arange(n_img)
    cap_cls = np.repeat(img_cls, 5)
    out = evaluate_n_fold(img, cap, img_cls, cap_cls, n_crossfolds=2,
                          n_images_per_fold=5)
    assert out["i2t"]["recall_1"] == 1.0
    assert out["t2i"]["recall_1"] == 1.0


def test_n_fold_caption_blocks_follow_image_folds():
    """Regression: when the image fold size doesn't align with 5-caption
    blocks (or caption counts are ragged), every fold's captions must
    stay inside the fold's image gallery — misaligned fixed slices left
    t2i queries with no positive, poisoning meanr with the int32
    sentinel."""
    rng = np.random.RandomState(2)
    n_img = 7                                  # 7 images, 5 captions each
    img = rng.randn(n_img, 8).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    cap = np.repeat(img, 5, axis=0)
    img_cls = np.arange(n_img)
    cap_cls = np.repeat(img_cls, 5)
    # n_images_per_fold=1 (the small-dataset path): the old fixed caption
    # slice would be len(cap)//5 = 7 captions per fold, crossing images
    out = evaluate_n_fold(img, cap, img_cls, cap_cls, n_crossfolds=5,
                          n_images_per_fold=1)
    for d in ("i2t", "t2i"):
        assert out[d]["recall_1"] == 1.0
        assert out[d]["meanr"] < n_img + 1     # no int32-sentinel poisoning

    # ragged caption counts: image 0 has 3 captions, image 1 has 7
    counts = [3, 7, 5, 5, 5, 5, 5]
    cap_r = np.concatenate([np.repeat(img[i:i + 1], c, axis=0)
                            for i, c in enumerate(counts)])
    cls_r = np.concatenate([np.full(c, i) for i, c in enumerate(counts)])
    out = evaluate_n_fold(img, cap_r, img_cls, cls_r, n_crossfolds=3,
                          n_images_per_fold=2)
    for d in ("i2t", "t2i"):
        assert out[d]["recall_1"] == 1.0
        assert out[d]["meanr"] < n_img + 1


@pytest.mark.slow   # ~3 min of [25k, 5k] double argsorts on CPU
def test_n_fold_at_true_coco_scale_matches_fixed_slices():
    """At the real COCO eval shape (5000 images / 25000 captions, 5 per
    image) the searchsorted fold boundaries must equal the reference's
    FIXED 5000-caption slices exactly (eval_coco.py:353-407), and the full
    5k i2t/t2i pass must run at this gallery size."""
    n_img, d = 5000, 32
    rng = np.random.RandomState(42)
    img = rng.randn(n_img, d).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    # captions = their image + small noise -> high but not perfect recall
    cap = np.repeat(img, 5, axis=0) + 0.05 * rng.randn(5 * n_img, d).astype(
        np.float32)
    cap /= np.linalg.norm(cap, axis=1, keepdims=True)
    img_cls = np.arange(n_img)
    cap_cls = np.repeat(img_cls, 5)

    got = evaluate_n_fold(img, cap, img_cls, cap_cls)

    # reference-style fixed slices: images [5k*k : 5k*(k+1)) paired with
    # captions [5000*k : 5000*(k+1)) per fold
    folds = {"i2t": [], "t2i": []}
    for k in range(5):
        isl = slice(k * 1000, (k + 1) * 1000)
        csl = slice(k * 5000, (k + 1) * 5000)
        folds["i2t"].append(evaluate_recall(img[isl], cap[csl],
                                            img_cls[isl], cap_cls[csl]))
        folds["t2i"].append(evaluate_recall(cap[csl], img[isl],
                                            cap_cls[csl], img_cls[isl]))
    for dkey in ("i2t", "t2i"):
        for m in folds[dkey][0]:
            want = float(np.mean([f[m] for f in folds[dkey]]))
            assert got[dkey][m] == pytest.approx(want, abs=1e-9), (dkey, m)

    # the full 25k x 5k / 5k x 25k pass at the true shape
    i2t = evaluate_recall(img, cap, img_cls, cap_cls)
    t2i = evaluate_recall(cap, img, cap_cls, img_cls)
    # noise level chosen so recall is informative (not 0/1 saturated)
    assert 0.3 < i2t["recall_1"] <= 1.0
    assert 0.3 < t2i["recall_1"] <= 1.0
    # n-fold galleries are 5x smaller -> recall can only improve
    assert got["i2t"]["recall_1"] >= i2t["recall_1"]


@pytest.mark.parametrize("k", [1, 2])
def test_chunked_resident_extraction_matches_host_path(monkeypatch, k):
    """The device-resident chunked extraction (one jitted lax.scan call
    per K batches, features kept on device, id-only dedup/alignment)
    must produce the same features and ordering as the per-batch
    host-roundtrip path — including at a size that pads both the last
    batch and the last chunk."""
    import jax.numpy as jnp

    from fedcola_tpu.data.datasets import fetch_synthetic
    from fedcola_tpu.eval.retrieval import extract_features
    from fedcola_tpu.models.mat import MATConfig, init_mat
    from fedcola_tpu.parallel.client_update import GroupSpec
    import jax

    monkeypatch.setenv("FEDCOLA_EVAL_CHUNK_STEPS", str(k))
    cfg = MATConfig(modalities=("img", "txt"), tasks=("rtv", "rtv"),
                    num_classes=(None, None), embed_dim=8, depth=1,
                    num_heads=2, vocab_size=40, max_text_len=6,
                    img_size=16, patch_size=8, drop_path_rate=0.0,
                    use_pallas=False, compute_dtype="float32")
    params = init_mat(cfg, jax.random.PRNGKey(0))
    spec = GroupSpec(modality="img+txt", criterion="ContrastiveLoss")
    ds = fetch_synthetic("Coco", "img+txt", "rtv", 50, None, img_hw=16,
                         seq_len=6, vocab_size=40, seed=5)
    data = {"img": jnp.asarray(ds.load_images(np.arange(ds.n))),
            "txt": jnp.asarray(ds.texts)}

    # batch 16, K=2 -> 32 rows/call, 50 rows -> 2 chunks with padding
    ri, rc, ric, rcc = extract_features(cfg, spec, params, ds,
                                        batch_size=16,
                                        rng=np.random.RandomState(7),
                                        resident=data)
    hi, hc, hic, hcc = extract_features(cfg, spec, params, ds,
                                        batch_size=16,
                                        rng=np.random.RandomState(7))
    np.testing.assert_array_equal(np.asarray(ric), hic)
    np.testing.assert_array_equal(np.asarray(rcc), hcc)
    np.testing.assert_allclose(np.asarray(ri), hi, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rc), hc, rtol=1e-5, atol=1e-6)


def test_unique_image_extraction_matches_joint_path(monkeypatch):
    """Deduped-store extraction split (img tower once per UNIQUE image,
    txt tower per caption row) must be bit-identical to the joint per-row
    path — the eval forward is per-sample deterministic, so duplicate
    rows of one image always carried equal features that dedup discarded."""
    import jax
    import jax.numpy as jnp

    from fedcola_tpu.data.datasets import TaskDataset
    from fedcola_tpu.eval.retrieval import extract_features
    from fedcola_tpu.models.mat import MATConfig, init_mat
    from fedcola_tpu.parallel.client_update import GroupSpec

    monkeypatch.setenv("FEDCOLA_EVAL_CHUNK_STEPS", "2")
    cfg = MATConfig(modalities=("img", "txt"), tasks=("rtv", "rtv"),
                    num_classes=(None, None), embed_dim=8, depth=1,
                    num_heads=2, vocab_size=40, max_text_len=6,
                    img_size=16, patch_size=8, drop_path_rate=0.0,
                    use_pallas=False, compute_dtype="float32")
    params = init_mat(cfg, jax.random.PRNGKey(0))
    spec = GroupSpec(modality="img+txt", criterion="ContrastiveLoss")

    rng = np.random.RandomState(3)
    n_img, n = 10, 50
    store = rng.randint(0, 256, (n_img, 16, 16, 3)).astype(np.uint8)
    row = np.repeat(np.arange(n_img), 5).astype(np.int32)
    texts = rng.randint(5, 40, (n, 6)).astype(np.int32)
    ds = TaskDataset(name="Coco", task="rtv", modality="img+txt",
                     num_classes=None, n=n, texts=texts, targets=texts,
                     image_ids=np.repeat(np.arange(n_img), 5),
                     ann_ids=np.arange(n),
                     _image_store=store, _image_row=row)
    data = {"img_store": jnp.asarray(store), "img_row": jnp.asarray(row),
            "txt": jnp.asarray(texts)}

    monkeypatch.setenv("FEDCOLA_EVAL_UNIQUE_IMAGES", "1")
    si, sc, sic, scc = extract_features(cfg, spec, params, ds,
                                        batch_size=16,
                                        rng=np.random.RandomState(7),
                                        resident=data)
    monkeypatch.setenv("FEDCOLA_EVAL_UNIQUE_IMAGES", "0")
    ji, jc, jic, jcc = extract_features(cfg, spec, params, ds,
                                        batch_size=16,
                                        rng=np.random.RandomState(7),
                                        resident=data)
    np.testing.assert_array_equal(np.asarray(sic), np.asarray(jic))
    np.testing.assert_array_equal(np.asarray(scc), np.asarray(jcc))
    np.testing.assert_allclose(np.asarray(si), np.asarray(ji),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(jc),
                               rtol=1e-6, atol=1e-7)
