"""Property-based fuzzing: our WordPiece (python AND native C++) must
agree with transformers.BertTokenizer on arbitrary text."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from anncur_tpu.models.native_tokenizer import NativeWordPieceTokenizer
from anncur_tpu.models.tokenizer import WordPieceTokenizer, make_test_vocab

WORDS = ["hello", "world", "test", "##ing", "un", "##aff", "##able", "the", "##s"]
VOCAB = make_test_vocab(WORDS)


@pytest.fixture(scope="module")
def hf():
    from transformers import BertTokenizer

    import tempfile, os

    d = tempfile.mkdtemp()
    path = os.path.join(d, "vocab.txt")
    WordPieceTokenizer(VOCAB).save_vocab(path)
    return BertTokenizer(vocab_file=path, do_lower_case=True)


@pytest.fixture(scope="module")
def ours():
    return WordPieceTokenizer(VOCAB)


@pytest.fixture(scope="module")
def native():
    tok = NativeWordPieceTokenizer(VOCAB)
    if not tok.native_available:
        pytest.skip("no native lib")
    return tok


# printable ascii + whitespace + some unicode
TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("Lu", "Ll", "Nd", "Po", "Zs", "Ps", "Pe", "Sm", "So"),
    ),
    max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_python_matches_hf(ours, hf, text):
    assert ours.tokenize(text) == hf.tokenize(text)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_native_matches_python(ours, native, text):
    assert native.encode(text) == ours.encode(text)
