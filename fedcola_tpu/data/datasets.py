"""Dataset readers -> array-backed task datasets.

The reference's data plane (``src/datasets/*``, ``src/loaders/data.py``)
yields torch ``Dataset`` objects decoded per-sample in DataLoader workers.
TPU-first re-design: every dataset becomes columnar numpy storage (uint8
pixels, int32 token ids, int64 labels) so per-round client batches are pure
array gathers that feed HBM directly; decode/resize move either to dataset
load time (small images) or on-device (``jax.image.resize``).

Readers (working families per SURVEY.md §2.2; dead inherited branches like
LEAF/BraTS are out of scope):
* CIFAR100   — cifar-100-python pickles (torchvisionparser.py:10-205)
* AG_NEWS    — train.csv/test.csv class,title,description
  (torchtextparser.py:17-201)
* MedicalAbstracts — medical_tc_{train,test}.csv, labels shifted to 0-base
  (medabstracts.py:10-81)
* MedMNIST   — <flag>mnist.npz (medmnist.py:11-70)
* Flickr30k  — train/test.csv `image_name|comment_number|comment` + images
  (flickr30k.py:9-81)
* Coco       — captions json + coco_{train,test}_ids.npy annotation-id lists
  truncated by --reduce_samples (coco.py:27-225)
* synthetic  — deterministic stand-ins for any family (benchmarks, tests)

Retrieval datasets keep the 5-captions-per-image alignment and expose
``image_ids``/``ann_ids``/``n_images`` for the recall evaluator.
"""

from __future__ import annotations

import json
import logging
import os
import pickle
import zlib
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from fedcola_tpu.data.tokenizer import WordPieceTokenizer

logger = logging.getLogger(__name__)

_DECODE_POOL = None


def _decode_pool():
    """Shared decode thread pool (PIL releases the GIL around jpeg work);
    one pool for the process instead of a fresh one per batch."""
    global _DECODE_POOL
    if _DECODE_POOL is None:
        import concurrent.futures
        _DECODE_POOL = concurrent.futures.ThreadPoolExecutor(
            16, thread_name_prefix="img-decode")
    return _DECODE_POOL


@dataclass
class TaskDataset:
    name: str
    task: str                      # cls | rtv
    modality: str                  # img | txt | img+txt
    num_classes: Optional[int]
    n: int
    images: Optional[np.ndarray] = None          # [N,H,W,C] uint8 (in-memory)
    image_paths: Optional[List[str]] = None      # lazy decode
    image_size: Optional[int] = None             # decode/resize target
    texts: Optional[np.ndarray] = None           # [N,L] int32
    targets: Optional[np.ndarray] = None         # [N] int64
    image_ids: Optional[np.ndarray] = None       # retrieval: per caption
    ann_ids: Optional[np.ndarray] = None
    caption_index_of_image: Optional[np.ndarray] = None
    _image_store: Optional[np.ndarray] = None    # materialize_images cache
    _image_row: Optional[np.ndarray] = None

    @property
    def n_images(self) -> int:
        if self.image_ids is None:
            return self.n
        return len(np.unique(self.image_ids))

    def load_images(self, indices: np.ndarray) -> np.ndarray:
        """uint8 [len(indices), H, W, C]; decodes lazily when path-backed
        (multi-threaded — PIL releases the GIL around jpeg decode)."""
        if self._image_store is not None:
            return self._image_store[self._image_row[indices]]
        if self.images is not None:
            return self.images[indices]
        assert self.image_paths is not None
        from PIL import Image
        size = self.image_size or 224
        out = np.zeros((len(indices), size, size, 3), np.uint8)

        def decode(j, i):
            with Image.open(self.image_paths[int(i)]) as im:
                out[j] = np.asarray(im.convert("RGB").resize((size, size)),
                                    np.uint8)

        if len(indices) > 8:
            list(_decode_pool().map(lambda ji: decode(*ji),
                                    enumerate(indices)))
        else:
            for j, i in enumerate(indices):
                decode(j, i)
        return out

    def materialize_images(self, max_bytes: int = 16 << 30) -> bool:
        """Decode the whole path-backed image set once (threaded) into an
        in-memory uint8 array, turning every later epoch's gathers into pure
        array indexing.  COCO-50k at 224px is ~7.5GB.  No-op if already
        in-memory or above ``max_bytes``."""
        if self.images is not None or self.image_paths is None:
            return self.images is not None
        # unique images only (retrieval sets repeat paths 5x per caption)
        uniq = sorted(set(self.image_paths))
        size = self.image_size or 224
        need = len(uniq) * size * size * 3
        if need > max_bytes:
            return False
        pos = {p: i for i, p in enumerate(uniq)}
        store = np.zeros((len(uniq), size, size, 3), np.uint8)
        from PIL import Image

        def decode(i, p):
            with Image.open(p) as im:
                store[i] = np.asarray(im.convert("RGB").resize((size, size)),
                                      np.uint8)

        list(_decode_pool().map(lambda ip: decode(*ip), enumerate(uniq)))
        # dedup indirection: retrieval sets repeat each image 5x per caption
        self._image_row = np.asarray([pos[p] for p in self.image_paths])
        self._image_store = store
        return True


# ------------------------------------------------------------- synthetic ---

def fetch_synthetic(name: str, modality: str, task: str,
                    n: int, num_classes: Optional[int],
                    img_hw: int = 32, seq_len: int = 40,
                    vocab_size: int = 30522, seed: int = 0) -> TaskDataset:
    rng = np.random.RandomState(seed)
    ds = TaskDataset(name=name, task=task, modality=modality,
                     num_classes=num_classes, n=n)
    if "img" in modality:
        ds.images = rng.randint(0, 256, (n, img_hw, img_hw, 3), np.uint8)
    if "txt" in modality:
        ids = rng.randint(5, vocab_size, (n, seq_len)).astype(np.int32)
        ids[:, 0] = 2  # [CLS]
        ds.texts = ids
    if task == "cls":
        ds.targets = rng.randint(0, num_classes, (n,)).astype(np.int64)
    else:
        # retrieval: 5 captions per image
        assert n % 5 == 0
        ds.image_ids = np.repeat(np.arange(n // 5), 5)
        ds.ann_ids = np.arange(n)
        ds.targets = ds.texts  # mm batches carry token ids in target slot
    return ds


# --------------------------------------------------------------- CIFAR100 --

def fetch_cifar100(root: str, train: bool, image_size: int = 32) -> TaskDataset:
    """Parses cifar-100-python pickles directly (no torchvision download)."""
    split = "train" if train else "test"
    path = os.path.join(root, "cifar-100-python", split)
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    targets = np.asarray(d[b"fine_labels"], np.int64)
    return TaskDataset(name="CIFAR100", task="cls", modality="img",
                       num_classes=100, n=len(targets),
                       images=np.ascontiguousarray(data, dtype=np.uint8),
                       targets=targets, image_size=image_size)


def fetch_torchvision_generic(name: str, root: str, train: bool,
                              image_size: Optional[int] = None) -> TaskDataset:
    """Generic torchvision-family fetcher (reference
    torchvisionparser.py:10-205): dispatches to torchvision datasets when
    the package + files are present (download=False; this environment has
    no egress).  CIFAR100 keeps its direct pickle reader above."""
    import torchvision
    ds = getattr(torchvision.datasets, name)(root=root, train=train,
                                             download=False)
    data = np.asarray(ds.data)
    if data.ndim == 3:
        data = data[..., None]
    if data.shape[1] == 3 and data.shape[-1] != 3:   # NCHW -> NHWC
        data = data.transpose(0, 2, 3, 1)
    targets = np.asarray(ds.targets, np.int64)
    return TaskDataset(name=name, task="cls", modality="img",
                       num_classes=int(targets.max()) + 1, n=len(targets),
                       images=data.astype(np.uint8), targets=targets,
                       image_size=image_size)


# AG_NEWS and the other fast-ai csv families route through the generic
# torchtext fetcher (fedcola_tpu/data/torchtext.py; see fetch_dataset).

# ----------------------------------------------------- MedicalAbstracts ----

def fetch_medabstracts(root: str, train: bool, tokenizer: WordPieceTokenizer,
                       seq_len: int = 40) -> TaskDataset:
    """medical_tc_{split}.csv with condition_label / medical_abstract columns,
    labels shifted to 0-base (medabstracts.py:23)."""
    import csv
    split = "train" if train else "test"
    path = os.path.join(root, f"medical_tc_{split}.csv")
    texts, labels = [], []
    with open(path, encoding="utf-8") as f:
        reader = csv.DictReader(f)
        for row in reader:
            labels.append(int(row["condition_label"]))
            texts.append(row["medical_abstract"])
    labels = np.asarray(labels, np.int64)
    labels = labels - labels.min()
    ids = tokenizer.encode_batch(texts, seq_len)
    return TaskDataset(name="MedicalAbstracts", task="cls", modality="txt",
                       num_classes=5, n=len(labels), texts=ids,
                       targets=labels)


# ---------------------------------------------------------------- MedMNIST --

# Modality flag -> medmnist subset (medmnist.py:11-17: data_flag_dict).
MEDMNIST_FLAGS = {"pat": "pathmnist", "ct": "organcmnist",
                  "img": "organcmnist", "mic": "bloodmnist",
                  "der": "dermamnist"}
# len(medmnist.INFO[flag]['label']) — the reference sets args.num_classes
# from the INFO table (medmnist.py:69), not from the labels present, so a
# --reduce_samples truncation never shrinks the head.
MEDMNIST_NUM_CLASSES = {"pathmnist": 9, "organcmnist": 11,
                        "bloodmnist": 8, "dermamnist": 7}


def fetch_medmnist(root: str, train: bool, modality_flag: str = "pat",
                   reduce_samples: int = -1,
                   reduce_samples_cls_scale: float = -1.0,
                   reduce_test_samples: int = -1) -> TaskDataset:
    """<flag>.npz with {split}_images / {split}_labels (medmnist.py:11-70).

    ``modality_flag`` is the dataset's ``--modalities`` entry (ct/img/mic/
    pat/der, reference data.py:295 passes args.modality); the returned
    dataset keeps that flag as its modality, exactly like the reference's
    ``raw_train.modality = modality`` (medmnist.py:47) — so scope filters
    and warmup/freeze matching treat MedMNIST clients by flag, not 'img'.
    ``reduce_samples`` takes priority over ``reduce_samples_cls_scale``
    (elif chain, medmnist.py:34-40); both apply to train only, while
    ``reduce_test_samples`` truncates test (medmnist.py:57-59).
    """
    flag = MEDMNIST_FLAGS.get(modality_flag, modality_flag)
    path = os.path.join(root, f"{flag}.npz")
    z = np.load(path)
    split = "train" if train else "test"
    images = z[f"{split}_images"]
    labels = z[f"{split}_labels"].reshape(-1).astype(np.int64)
    if images.ndim == 3:
        images = images[..., None]
    if train:
        if reduce_samples > 0:
            images, labels = images[:reduce_samples], labels[:reduce_samples]
        elif reduce_samples_cls_scale > 0:
            new_num = int(len(labels) * reduce_samples_cls_scale)
            images, labels = images[:new_num], labels[:new_num]
    elif 0 < reduce_test_samples < len(labels):
        images = images[:reduce_test_samples]
        labels = labels[:reduce_test_samples]
    num_classes = MEDMNIST_NUM_CLASSES.get(flag, int(labels.max()) + 1)
    return TaskDataset(name="MedMNIST", task="cls", modality=modality_flag,
                       num_classes=num_classes, n=len(labels),
                       images=images.astype(np.uint8), targets=labels)


# ---------------------------------------------------------------- Flickr ----

def fetch_flickr30k(root: str, train: bool, tokenizer: WordPieceTokenizer,
                    seq_len: int = 40, train_all: bool = False,
                    image_size: int = 224) -> TaskDataset:
    """CSV of image_name|comment_number|comment (flickr30k.py:9-45);
    5 captions/image; __getitem__ image id = index//5."""
    import csv
    fname = ("train_all.csv" if train_all else "train.csv") if train else "test.csv"
    path = os.path.join(root, fname)
    names, caps, short_rows = [], [], 0
    with open(path, encoding="utf-8") as f:
        reader = csv.reader(f, delimiter="|")
        header = next(reader)
        for row in reader:
            if not row or not row[0].strip():
                continue            # blank line
            # NEVER drop a malformed row: the dataset layout is 5
            # consecutive captions per image and image_ids = arange(n)//5
            # below — one dropped row would shift every later caption onto
            # the wrong image.  The known results.csv row with a missing
            # comment becomes an empty caption ('' ≙ the reference's
            # pandas NaN row); extra '|' inside a comment is re-joined.
            names.append(row[0].strip())
            if len(row) < 3:
                caps.append("")
                short_rows += 1
            else:
                caps.append("|".join(row[2:]).strip())
    if short_rows:
        logger.warning("[FLICKR30K] %s: %d row(s) without a comment field "
                       "kept as empty captions to preserve the 5-per-image "
                       "alignment", fname, short_rows)
    ids = tokenizer.encode_batch(caps, seq_len)
    n = len(caps)
    img_dir = os.path.join(root, "flickr30k_images")
    paths = [os.path.join(img_dir, nm) for nm in names]
    return TaskDataset(name="Flickr30k", task="rtv", modality="img+txt",
                       num_classes=None, n=n, texts=ids, targets=ids,
                       image_paths=paths, image_size=image_size,
                       image_ids=np.arange(n) // 5, ann_ids=np.arange(n))


# ------------------------------------------------------------------ COCO ----

def fetch_coco(root: str, train: bool, tokenizer: WordPieceTokenizer,
               seq_len: int = 40, reduce_samples: int = 50000,
               reduce_test_samples: int = -1,
               image_size: int = 224) -> TaskDataset:
    """COCO captions without pycocotools: parses the captions json directly.

    The reference selects annotation ids from data/coco/coco_train_ids.npy
    (truncated to --reduce_samples) and coco_test_ids.npy (coco.py:188-214);
    we honor the same id lists when present.
    """
    ids_file = os.path.join(root, "coco_train_ids.npy" if train
                            else "coco_test_ids.npy")
    ann_file = os.path.join(
        root, "annotations",
        "captions_train2014.json" if train else "captions_val2014.json")
    ann_by_id, rows_of = _parse_coco_annotations(
        ann_file, os.path.join(root, "all_images"))
    if os.path.exists(ids_file):
        ann_ids = np.load(ids_file)
    else:
        ann_ids = np.asarray(sorted(ann_by_id.keys()))
    if train and reduce_samples > 0:
        ann_ids = ann_ids[:reduce_samples]
    if (not train) and reduce_test_samples > 0:
        ann_ids = ann_ids[:reduce_test_samples]

    caps, img_ids, paths = rows_of(ann_ids)
    ids = tokenizer.encode_batch(caps, seq_len)
    return TaskDataset(name="Coco", task="rtv", modality="img+txt",
                       num_classes=None, n=len(caps), texts=ids, targets=ids,
                       image_paths=paths, image_size=image_size,
                       image_ids=np.asarray(img_ids),
                       ann_ids=np.asarray(ann_ids))


def _parse_coco_annotations(ann_file: str, img_dir: str):
    """Parse a COCO captions json once; shared by ``fetch_coco`` and the
    CreamFL public loader.  Returns ``(ann_by_id, rows_of)`` where
    ``rows_of(ann_ids)`` yields the aligned (captions, image_ids,
    image_paths) lists for the given annotation ids."""
    with open(ann_file, encoding="utf-8") as f:
        ann = json.load(f)
    img_file_of = {im["id"]: im["file_name"] for im in ann["images"]}
    ann_by_id = {a["id"]: a for a in ann["annotations"]}

    def rows_of(ann_ids):
        caps, img_ids, paths = [], [], []
        for aid in ann_ids:
            a = ann_by_id[int(aid)]
            caps.append(a["caption"])
            img_ids.append(a["image_id"])
            paths.append(os.path.join(img_dir, img_file_of[a["image_id"]]))
        return caps, img_ids, paths

    return ann_by_id, rows_of


def fetch_coco_public(pub_data_dir: str, pub_anno_path: str,
                      tokenizer: WordPieceTokenizer, seq_len: int = 40,
                      num_pub_samples: int = 500,
                      image_size: int = 224) -> TaskDataset:
    """CreamFL public set, exactly as ``get_pub_loader``
    (creamflserver.py:100-126): annotation ids are the LAST
    ``num_pub_samples`` entries of ``coco_train_ids.npy`` (found two levels
    above the annotation file), annotations come from ``pub_anno_path`` and
    images from ``pub_data_dir``.  The canonical scripts pass
    captions_train2014.json here (scripts/coco.sh:16)."""
    # two-levels-up of the annotation file (≡ the reference's
    # os.sep.join(anno_path.split('/')[:-2]), creamflserver.py:106, but
    # separator-safe)
    parent = os.path.dirname(os.path.dirname(pub_anno_path))
    ann_ids = np.load(os.path.join(parent, "coco_train_ids.npy"))
    ann_ids = ann_ids[-num_pub_samples:]
    _, rows_of = _parse_coco_annotations(pub_anno_path, pub_data_dir)
    caps, img_ids, paths = rows_of(ann_ids)
    ids = tokenizer.encode_batch(caps, seq_len)
    return TaskDataset(name="CocoPublic", task="rtv", modality="img+txt",
                       num_classes=None, n=len(caps), texts=ids, targets=ids,
                       image_paths=paths, image_size=image_size,
                       image_ids=np.asarray(img_ids),
                       ann_ids=np.asarray(ann_ids))


# ------------------------------------------------------------- dispatch -----

def fetch_dataset(name: str, root: str, train: bool,
                  tokenizer: Optional[WordPieceTokenizer] = None,
                  seq_len: int = 40, synthetic: bool = False,
                  synthetic_n: int = 2000, image_size: Optional[int] = None,
                  **kw) -> TaskDataset:
    """Dataset dispatch (reference data.py:194-309, working families only).
    ``synthetic=True`` (or missing files) falls back to deterministic
    synthetic data with the right shapes/vocab."""
    from fedcola_tpu.config import DATASET_2_MODALITY, DATASET_2_TASK, NUM_CLASS
    if synthetic:
        n = synthetic_n if train else max(synthetic_n // 4, 500)
        if DATASET_2_TASK[name] == "rtv":
            n -= n % 5
        return fetch_synthetic(
            name, DATASET_2_MODALITY[name], DATASET_2_TASK[name], n,
            NUM_CLASS[name],
            # synthetic stand-ins keep the real dataset's NATIVE storage
            # size (CIFAR pickles are 32px; the device resizes, just like
            # the real path) — shipping pre-resized pixels would both
            # misrepresent host traffic and waste the slow host link
            img_hw=32 if name == "CIFAR100" else (image_size or 224),
            seq_len=seq_len,
            vocab_size=tokenizer.vocab_size if tokenizer else 30522,
            # stable across processes (str hash() is salted per
            # interpreter; a resumed or multi-host run must regenerate
            # identical synthetic data)
            seed=zlib.crc32(f"{name}/{train}".encode()) % (2 ** 31))
    if name == "CIFAR100":
        return fetch_cifar100(root, train, image_size=image_size or 32)
    from fedcola_tpu.data.torchtext import (TORCHTEXT_NUM_CLASSES,
                                            fetch_torchtext_generic)
    if name in TORCHTEXT_NUM_CLASSES:
        # reference routes these through the generic torchtext parser with
        # vocab building unless a bert tokenizer is requested
        # (data.py:173-188, torchtextparser.py:115-161)
        return fetch_torchtext_generic(
            name, root, train, seq_len,
            kw.get("num_embeddings", 1000),
            tokenizer if kw.get("use_bert_tokenizer") else None)
    if name == "MedicalAbstracts":
        return fetch_medabstracts(root, train, tokenizer, seq_len)
    if name == "MedMNIST":
        return fetch_medmnist(root, train, kw.get("modality_flag", "pat"),
                              kw.get("reduce_samples", -1),
                              kw.get("reduce_samples_cls_scale", -1.0),
                              kw.get("reduce_test_samples", -1))
    if name == "Flickr30k":
        return fetch_flickr30k(root, train, tokenizer, seq_len,
                               kw.get("train_all", False),
                               image_size=image_size or 224)
    if name == "Coco":
        return fetch_coco(root, train, tokenizer, seq_len,
                          kw.get("reduce_samples", 50000),
                          kw.get("reduce_test_samples", -1),
                          image_size=image_size or 224)
    # generic torchvision families (CIFAR10, MNIST-likes) — reference
    # torchvisionparser.py path
    try:
        return fetch_torchvision_generic(name, root, train, image_size)
    except (AttributeError, ImportError, RuntimeError):
        pass
    raise NotImplementedError(
        f"dataset {name!r}: only the reference's working families are "
        "supported (SURVEY.md §2.2 D1 notes the rest are dead branches)")
