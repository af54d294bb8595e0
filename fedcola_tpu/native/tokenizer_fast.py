"""ctypes binding for the native batch WordPiece encoder.

Fast path for pure-ASCII text; strings containing non-ASCII bytes are
encoded by the Python reference implementation so Unicode (NFD accent
stripping, CJK spacing) semantics stay exact.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

from fedcola_tpu.native import build_library

_lib = None
_handles = {}


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = build_library("wordpiece.cpp")
    if path is None:
        raise RuntimeError("native tokenizer unavailable")
    lib = ctypes.CDLL(path)
    lib.wp_build.restype = ctypes.c_void_p
    lib.wp_build.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32), ctypes.c_int32,
    ]
    _lib = lib
    return lib


def _vocab_handle(tok) -> int:
    """Native vocab handle, cached by *content* (a digest of the id->token
    mapping), never by object identity — two tokenizers with the same vocab
    share one handle, and a GC'd tokenizer can't alias a new object into the
    wrong handle.  Handles live for the process (bounded by the number of
    distinct vocabs, which is tiny: one per dataset family)."""
    cached = getattr(tok, "_native_vocab_key", None)
    if cached is not None and cached in _handles:
        return _handles[cached]
    import hashlib
    items = sorted(tok.vocab.items(), key=lambda kv: kv[1])
    # Serialize with explicit gap placeholders: vocab files may contain
    # blank lines (from_vocab_file skips them but keeps line-number ids),
    # so line i of the blob must be the token with id i or empty — wp_build
    # increments the id for empty lines without inserting a token.
    max_id = items[-1][1] if items else -1
    lines = [""] * (max_id + 1)
    for token, idx in items:
        lines[idx] = token
    blob = "\n".join(lines).encode("utf-8")
    key = hashlib.sha256(blob).hexdigest()
    if key not in _handles:
        lib = _load()
        _handles[key] = ctypes.c_void_p(lib.wp_build(blob, len(blob)))
    # memoize the content digest on the tokenizer so repeat encode_batch
    # calls skip the O(V log V) sort + full-blob hash (the vocab is
    # immutable after construction); the handle map stays content-keyed
    tok._native_vocab_key = key
    return _handles[key]


def encode_batch(tok, texts: List[str], max_length: int) -> np.ndarray:
    """Returns [n, max_length] int32 ids; mixed ASCII/Unicode batches are
    split between the native and Python paths."""
    # the C++ encoder implements the DEFAULT tokenizer semantics only
    # (lowercasing on, 100-char word cap) and needs room for [CLS]/[SEP];
    # any other configuration must take the Python reference path — a
    # silent semantic mismatch would corrupt ids with no exception for
    # the caller's except-fallback to catch
    if (not tok.do_lower_case or tok.max_chars_per_word != 100
            or max_length < 2):
        raise RuntimeError("native path supports default tokenizer "
                           "semantics and max_length >= 2 only")
    lib = _load()
    handle = _vocab_handle(tok)

    n = len(texts)
    out = np.empty((n, max_length), np.int32)
    ascii_idx, other_idx = [], []
    for i, t in enumerate(texts):
        (ascii_idx if t.isascii() else other_idx).append(i)

    if ascii_idx:
        sel = [texts[i] for i in ascii_idx]
        raw = [s.encode("ascii") for s in sel]
        blob = b"".join(raw)
        offsets = np.zeros(len(raw) + 1, np.int64)
        np.cumsum([len(r) for r in raw], out=offsets[1:])
        sub = np.empty((len(raw), max_length), np.int32)
        lib.wp_encode_batch(handle, blob, offsets, len(raw), max_length,
                            tok.cls_id, tok.sep_id, tok.pad_id, tok.unk_id,
                            sub, min(os.cpu_count() or 1, 16))
        out[np.asarray(ascii_idx)] = sub

    for i in other_idx:
        out[i] = tok.encode(texts[i], max_length)
    return out
