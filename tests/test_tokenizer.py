"""Tokenizer tests: WordPiece semantics vs HF BertTokenizer on the
reference's shipped vocabularies, and native-vs-python parity."""

import os

import numpy as np
import pytest

from fedcola_tpu.data.tokenizer import WordPieceTokenizer, get_tokenizer

FLICKR_VOCAB = "/root/reference/data/flickr30k/vocab.txt"
MED_VOCAB = "/root/reference/data/medabstract/vocab.txt"

SAMPLES = [
    "A man riding a horse on the beach.",
    "Two dogs play, with a RED ball!",
    "patients with acute myocardial infarction (n=120) were studied.",
    "the quick brown fox jumps over the lazy dog",
    "café au lait — naïve résumé",     # non-ASCII: exercises fallbacks
]


@pytest.mark.skipif(not os.path.exists(FLICKR_VOCAB),
                    reason="reference vocab not mounted")
def test_matches_hf_bert_tokenizer():
    from transformers import BertTokenizer
    hf = BertTokenizer(FLICKR_VOCAB)
    ours = WordPieceTokenizer.from_vocab_file(FLICKR_VOCAB)
    for text in SAMPLES:
        ref = hf(text, padding="max_length", truncation=True,
                 max_length=40)["input_ids"]
        got = ours.encode(text, 40).tolist()
        assert got == ref, f"{text!r}: {got} != {ref}"


@pytest.mark.skipif(not os.path.exists(MED_VOCAB),
                    reason="reference vocab not mounted")
def test_matches_hf_on_medical_vocab():
    from transformers import BertTokenizer
    hf = BertTokenizer(MED_VOCAB)
    ours = WordPieceTokenizer.from_vocab_file(MED_VOCAB)
    text = ("BACKGROUND: Myocardial infarction risk was assessed in 1,200 "
            "patients undergoing dialysis; p<0.05 was significant.")
    ref = hf(text, padding="max_length", truncation=True,
             max_length=64)["input_ids"]
    assert ours.encode(text, 64).tolist() == ref


def test_native_matches_python():
    vocab_path = FLICKR_VOCAB if os.path.exists(FLICKR_VOCAB) else None
    tok = (WordPieceTokenizer.from_vocab_file(vocab_path)
           if vocab_path else WordPieceTokenizer.synthetic(500))
    try:
        from fedcola_tpu.native import tokenizer_fast
        fast = tokenizer_fast.encode_batch(tok, SAMPLES, 32)
    except RuntimeError:
        pytest.skip("native toolchain unavailable")
    slow = np.stack([tok.encode(t, 32) for t in SAMPLES])
    np.testing.assert_array_equal(fast, slow)


def test_non_default_tokenizer_takes_python_path():
    """The C++ encoder hardcodes default semantics (lowercasing, 100-char
    word cap); a cased tokenizer must NOT route through it — a silent
    lowercase would corrupt ids with no exception to catch.  encode_batch
    must still produce the Python reference's output."""
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
             "Hello": 4, "hello": 5, "world": 6}
    tok = WordPieceTokenizer(vocab, do_lower_case=False)
    out = tok.encode_batch(["Hello world", "hello world"], 8)
    ref = np.stack([tok.encode(t, 8) for t in ["Hello world",
                                               "hello world"]])
    np.testing.assert_array_equal(out, ref)
    assert out[0][1] == 4 and out[1][1] == 5   # case preserved


def test_native_handles_vocab_gaps_and_del_char(tmp_path):
    """Regression: vocab.txt blank lines create id gaps (line-number ids),
    and DEL (0x7F) is ASCII but must be dropped as a control char on the
    native path exactly like the Python path."""
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text(
        "[PAD]\n[UNK]\n[CLS]\n[SEP]\n\nhello\n\nworld\n##d\nhel\n##lo\n")
    tok = WordPieceTokenizer.from_vocab_file(str(vocab_file))
    assert tok.vocab["hello"] == 5 and tok.vocab["world"] == 7
    texts = ["hello world", "hel\x7flo world", "hello worl\x7fd"]
    try:
        from fedcola_tpu.native import tokenizer_fast
        fast = tokenizer_fast.encode_batch(tok, texts, 8)
    except RuntimeError:
        pytest.skip("native toolchain unavailable")
    slow = np.stack([tok.encode(t, 8) for t in texts])
    np.testing.assert_array_equal(fast, slow)
    assert fast[0, 1] == 5 and fast[0, 2] == 7  # line-number ids, not dense


def test_truncation_and_padding():
    tok = WordPieceTokenizer.synthetic(100)
    ids = tok.encode("x " * 100, max_length=10)
    assert len(ids) == 10
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
    short = tok.encode("", max_length=8)
    assert short[0] == tok.cls_id and short[1] == tok.sep_id
    assert (short[2:] == tok.pad_id).all()
