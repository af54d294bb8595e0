"""Path-backed dataset fixtures for benches, tests, and evidence runs.

These write REAL on-disk datasets in the reference's layouts (COCO
captions json + jpegs, reference ``coco.py``; Flickr30k pipe-CSV + jpegs,
reference ``flickr30k.py:9-45``) so end-to-end runs exercise the actual
data path: file parse -> jpeg decode/materialize -> deduped-store HBM
staging -> on-device row gathers.  Captions encode their image's index
("a photo number {i} ...") so image<->caption retrieval has a learnable
target and recall@k measures real convergence, not chance.

``eval_overlap=True`` (the default) makes the test split reference the
SAME jpegs and caption codes as the first ``n_test_img`` train images:
retrieval eval then measures whether training actually aligned those
image<->caption pairs — an infrastructure-convergence target (recall
climbs from chance toward 1.0 as the towers align), NOT a generalization
measure; random noise images admit no generalizable signal.  With
``eval_overlap=False`` the test split gets fresh noise images and unseen
caption codes (timing-only: recall stays at chance).

Fixtures are content-stamped and cached across runs.
"""

from __future__ import annotations

import json
import os

import numpy as np

def _vocab(n_codes: int):
    """Every caption code must be a whole vocab token: WordPiece turns
    any number it cannot fully piece together into [UNK], which would
    collapse distinct captions into one and silently destroy the
    learnable image<->caption target."""
    return (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "photo", "number",
             "caption", "of", "several", "things"]
            + [str(i) for i in range(max(n_codes, 50))])


def _write_images(rng, img_dir, names, size):
    from PIL import Image
    os.makedirs(img_dir, exist_ok=True)
    for fn in names:
        Image.fromarray(rng.randint(0, 256, (size, size, 3))
                        .astype(np.uint8)).save(os.path.join(img_dir, fn),
                                                quality=85)


def _caption(i: int, c: int) -> str:
    return f"a photo number {i} caption {c} of several things"


def coco_fixture(root: str, n_train_img: int, n_test_img: int,
                 size: int, eval_overlap: bool = True) -> str:
    """COCO-format fixture: ``annotations/captions_{train,val}2014.json``
    + ``all_images/`` jpegs + ``vocab.txt`` (the layout ``fetch_coco``
    parses; reference coco.py via pycocotools)."""
    assert not eval_overlap or n_test_img <= n_train_img, (
        "eval_overlap reuses train_{i}.jpg for the test split, so it "
        f"needs n_test_img ({n_test_img}) <= n_train_img ({n_train_img})")
    stamp = os.path.join(
        root, f"ready_{n_train_img}_{n_test_img}_{size}_{int(eval_overlap)}")
    if os.path.exists(stamp):
        return root
    # the generated files (annotations/csvs/vocab.txt) are shared per
    # root: a rebuild with different parameters overwrites them, so any
    # OTHER parameterization's stamp would now validate stale data —
    # drop all stamps before rebuilding
    import glob as _glob
    for old_stamp in _glob.glob(os.path.join(root, "ready_*")):
        os.remove(old_stamp)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    rng = np.random.RandomState(0)

    def make(split, n_img):
        overlap = split == "test" and eval_overlap
        names = [(f"train_{i}.jpg" if overlap else f"{split}_{i}.jpg")
                 for i in range(n_img)]
        if not overlap:
            _write_images(rng, os.path.join(root, "all_images"), names,
                          size)
        images, anns = [], []
        aid = 0 if split == "train" else 10 ** 7
        base = 0 if split == "train" else 10 ** 6
        code = 0 if (split == "train" or overlap) else n_train_img
        for i, fn in enumerate(names):
            images.append({"id": base + i, "file_name": fn})
            for c in range(5):
                anns.append({"id": aid, "image_id": base + i,
                             "caption": _caption(code + i, c)})
                aid += 1
        name = ("captions_train2014.json" if split == "train"
                else "captions_val2014.json")
        with open(os.path.join(root, "annotations", name), "w") as f:
            json.dump({"images": images, "annotations": anns}, f)

    make("train", n_train_img)
    make("test", n_test_img)
    n_codes = n_train_img + (0 if eval_overlap else n_test_img)
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        f.write("\n".join(_vocab(n_codes)))
    open(stamp, "w").close()
    return root


def flickr_fixture(root: str, n_train_img: int, n_test_img: int,
                   size: int, eval_overlap: bool = True) -> str:
    """Flickr30k-format fixture: ``{train,test}.csv`` pipe-CSVs
    (``image_name|comment_number|comment``, 5 captions/image; test reuses
    train_{i}.jpg when ``eval_overlap``) +
    ``flickr30k_images/`` jpegs + ``vocab.txt`` (the layout
    ``fetch_flickr30k`` parses; reference flickr30k.py:9-45)."""
    assert not eval_overlap or n_test_img <= n_train_img, (
        "eval_overlap reuses train_{i}.jpg for the test split, so it "
        f"needs n_test_img ({n_test_img}) <= n_train_img ({n_train_img})")
    stamp = os.path.join(
        root, f"ready_{n_train_img}_{n_test_img}_{size}_{int(eval_overlap)}")
    if os.path.exists(stamp):
        return root
    # the generated files (annotations/csvs/vocab.txt) are shared per
    # root: a rebuild with different parameters overwrites them, so any
    # OTHER parameterization's stamp would now validate stale data —
    # drop all stamps before rebuilding
    import glob as _glob
    for old_stamp in _glob.glob(os.path.join(root, "ready_*")):
        os.remove(old_stamp)
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)

    def make(split, n_img, base, overlap=False):
        names = [(f"train_{i}.jpg" if overlap else f"{split}_{i}.jpg")
                 for i in range(n_img)]
        if not overlap:
            _write_images(rng, os.path.join(root, "flickr30k_images"),
                          names, size)
        with open(os.path.join(root, f"{split}.csv"), "w",
                  encoding="utf-8") as f:
            f.write("image_name| comment_number| comment\n")
            for i, fn in enumerate(names):
                for c in range(5):
                    f.write(f"{fn}| {c}| {_caption(base + i, c)}\n")

    make("train", n_train_img, 0)
    # train_all.csv = train.csv for the fixture (the reference's
    # --train_all concatenates extra unlabeled data)
    import shutil
    shutil.copyfile(os.path.join(root, "train.csv"),
                    os.path.join(root, "train_all.csv"))
    make("test", n_test_img, 0 if eval_overlap else n_train_img,
         overlap=eval_overlap)
    n_codes = n_train_img + (0 if eval_overlap else n_test_img)
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        f.write("\n".join(_vocab(n_codes)))
    open(stamp, "w").close()
    return root
