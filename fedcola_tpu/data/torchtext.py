"""Generic torchtext-family text-classification fetcher.

Reimplements the reference's ``fetch_torchtext_dataset``
(src/datasets/torchtextparser.py:17-201) without the torchtext dependency:

* the fast-ai csv layout (``train.csv``/``test.csv``, label in column 0,
  text in the remaining columns joined by spaces);
* ``basic_english`` tokenisation (torchtext.data.utils._basic_english_
  normalize: lowercase + the fixed regex substitutions, then split);
* vocab built from the TRAIN split ordered by frequency (first-seen order
  breaks ties, like Counter insertion order under Python's stable sort),
  capped at ``num_embeddings`` tokens, ``<unk>`` default index, ``<pad>``
  inserted at 0 (torchtextparser.py:157-161);
* the reference's pad quirk ``pad_len = max_len - len % max_len`` nets out
  to truncate-or-pad to ``seq_len`` with the pad id (torchtextparser.py:
  101-110);
* labels ``int(row[0]) - 1`` then min-shifted to 0 base
  (torchtextparser.py:93, 179-181);
* ``tr_{seq_len}.npz`` / ``te_{seq_len}.npz`` cache with the reference's
  exact file/array names (``arr_0``/``arr_1``) so caches produced by either
  implementation interchange (torchtextparser.py:165-185); written only
  when the data root is writable.
"""

from __future__ import annotations

import csv
import logging
import os
import re
import sys
from collections import Counter
from typing import Dict, List, Optional, Tuple

import numpy as np

from fedcola_tpu.data.datasets import TaskDataset

logger = logging.getLogger(__name__)

# reference torchtextparser.py:57-66
TORCHTEXT_NUM_CLASSES = {
    "AG_NEWS": 4,
    "SogouNews": 5,
    "DBpedia": 14,
    "YelpReviewPolarity": 2,
    "YelpReviewFull": 5,
    "YahooAnswers": 10,
    "AmazonReviewPolarity": 2,
    "AmazonReviewFull": 5,
}

# torchtext.data.utils._basic_english_normalize patterns, in order
_PATTERNS = [
    (re.compile(r"\'"), " ' "),
    (re.compile(r"\""), ""),
    (re.compile(r"\."), " . "),
    (re.compile(r"<br \/>"), " "),
    (re.compile(r","), " , "),
    (re.compile(r"\("), " ( "),
    (re.compile(r"\)"), " ) "),
    (re.compile(r"\!"), " ! "),
    (re.compile(r"\?"), " ? "),
    (re.compile(r"\;"), " "),
    (re.compile(r"\:"), " "),
    (re.compile(r"\s+"), " "),
]


def basic_english_tokenize(line: str) -> List[str]:
    line = line.lower()
    for pat, repl in _PATTERNS:
        line = pat.sub(repl, line)
    return line.split()


def _csv_rows(path: str) -> Tuple[List[int], List[List[str]]]:
    csv.field_size_limit(min(sys.maxsize, 2 ** 31 - 1))
    labels, token_lists = [], []
    with open(path, encoding="utf8") as f:
        for row in csv.reader(f):
            labels.append(int(row[0]) - 1)
            token_lists.append(basic_english_tokenize(" ".join(row[1:])))
    return labels, token_lists


def build_vocab(token_lists: List[List[str]],
                max_tokens: Optional[int] = None) -> Dict[str, int]:
    """Frequency-descending vocab with first-seen tie order; specials
    ``<pad>``=0, ``<unk>``=1 (the reference's insert_token('<pad>', 0) after
    specials=['<unk>'] — torchtextparser.py:157-161).  ``max_tokens`` counts
    the ``<unk>`` special but not the later-inserted ``<pad>``, matching
    torchtext's accounting."""
    counter: Counter = Counter()
    for toks in token_lists:
        counter.update(toks)
    items = sorted(counter.items(), key=lambda kv: -kv[1])
    if max_tokens is not None:
        items = items[:max(max_tokens - 1, 0)]
    vocab = {"<pad>": 0, "<unk>": 1}
    for tok, _ in items:
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def _encode(token_lists: List[List[str]], vocab: Dict[str, int],
            seq_len: int) -> np.ndarray:
    unk = vocab["<unk>"]
    pad = vocab["<pad>"]
    out = np.full((len(token_lists), seq_len), pad, np.int32)
    for i, toks in enumerate(token_lists):
        ids = [vocab.get(t, unk) for t in toks[:seq_len]]
        out[i, :len(ids)] = ids
    return out


_VOCAB_CACHE: Dict[Tuple[str, Optional[int]], Dict[str, int]] = {}


def fetch_torchtext_generic(name: str, root: str, train: bool,
                            seq_len: int = 40,
                            num_embeddings: Optional[int] = 1000,
                            tokenizer=None) -> TaskDataset:
    """Load one split of a torchtext-family dataset from local csv files.

    ``tokenizer``: an optional WordPiece tokenizer (the reference's
    use_model_tokenizer/use_bert_tokenizer path, torchtextparser.py:115-129);
    None (default) builds the basic_english vocab from the train split."""
    if name not in TORCHTEXT_NUM_CLASSES:
        raise NotImplementedError(
            f"{name!r} is not a supported torchtext family "
            f"({sorted(TORCHTEXT_NUM_CLASSES)})")
    num_classes = TORCHTEXT_NUM_CLASSES[name]
    split = "train" if train else "test"
    cache = os.path.join(root, f"{'tr' if train else 'te'}_{seq_len}.npz")
    if tokenizer is None and os.path.exists(cache):
        with np.load(cache, allow_pickle=True) as z:
            ids = np.asarray(z["arr_0"], np.int32)
            labels = np.asarray(z["arr_1"], np.int64)
            # the reference-layout filename encodes only seq_len; a
            # cache written under a different --num_embeddings would
            # silently return stale encodings, so stamp the vocab size
            # inside and rebuild on mismatch (an unstamped cache — the
            # reference's own files — is trusted as-is)
            cached_ne = int(z["num_embeddings"]) if "num_embeddings" in z \
                else None
        if cached_ne is None or cached_ne == (num_embeddings or 0):
            labels = labels - labels.min()
            return TaskDataset(name=name, task="cls", modality="txt",
                               num_classes=num_classes, n=len(labels),
                               texts=ids, targets=labels)
        logger.info("[TORCHTEXT] %s cache %s was built with "
                    "num_embeddings=%d (now %d); rebuilding", name,
                    os.path.basename(cache), cached_ne,
                    num_embeddings or 0)

    csv_path = os.path.join(root, f"{split}.csv")
    labels, token_lists = _csv_rows(csv_path)
    labels = np.asarray(labels, np.int64)
    labels = labels - labels.min()

    if tokenizer is not None:
        ids = tokenizer.encode_batch(
            [" ".join(t) for t in token_lists], seq_len)
    else:
        key = (os.path.join(root, "train.csv"), num_embeddings)
        if key not in _VOCAB_CACHE:
            tl = token_lists if train else _csv_rows(key[0])[1]
            _VOCAB_CACHE[key] = build_vocab(tl, num_embeddings)
        ids = _encode(token_lists, _VOCAB_CACHE[key], seq_len)
        if os.access(root, os.W_OK):
            np.savez_compressed(cache, ids.astype(np.int64),
                                np.asarray(labels),
                                num_embeddings=np.int64(num_embeddings or 0))
    return TaskDataset(name=name, task="cls", modality="txt",
                       num_classes=num_classes, n=len(labels),
                       texts=ids, targets=labels)
