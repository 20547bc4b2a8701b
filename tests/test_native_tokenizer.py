"""Native C++ WordPiece: byte-identical ids vs the Python tokenizer on
ASCII, transparent fallback on Unicode, and a sanity speed check."""

import time

import numpy as np
import pytest

from anncur_tpu.models.native_tokenizer import NativeWordPieceTokenizer
from anncur_tpu.models.tokenizer import WordPieceTokenizer, make_test_vocab

WORDS = ["hello", "world", "un", "##aff", "##able", "test", "token", "##izer", "fast"]


@pytest.fixture(scope="module")
def pair():
    vocab = make_test_vocab(WORDS)
    native = NativeWordPieceTokenizer(vocab)
    python = WordPieceTokenizer(vocab)
    if not native.native_available:
        pytest.skip("native tokenizer lib unavailable (no g++)")
    return native, python


SAMPLES = [
    "hello world",
    "unaffable tokenizer test!!!",
    "HELLO, World... fast-test",
    "a b c 123 456",
    "",
    "   spaces\t\teverywhere   ",
    "word-with-dashes and 'quotes'",
    "x" * 150,  # exceeds max_chars_per_word -> UNK
]


@pytest.mark.parametrize("text", SAMPLES)
def test_ascii_parity(pair, text):
    native, python = pair
    assert native.encode(text) == python.encode(text)


def test_unicode_fallback(pair):
    native, python = pair
    for text in ["naïve café", "日本語 test", "emoji 🙂 here"]:
        assert native.encode(text) == python.encode(text)


def test_speedup(pair):
    native, python = pair
    texts = ["hello world unaffable test token fast " * 20] * 200
    t0 = time.time()
    for t in texts:
        python.encode(t)
    t_py = time.time() - t0
    t0 = time.time()
    for t in texts:
        native.encode(t)
    t_cc = time.time() - t0
    # native must not be slower; typically it is several times faster
    assert t_cc <= t_py, f"native slower: {t_cc:.3f}s vs python {t_py:.3f}s"
