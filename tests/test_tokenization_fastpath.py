"""Id-level representation builders must equal the token-string builders
exactly, for both python and native tokenizers."""

import numpy as np
import pytest

from anncur_tpu.data.tokenization import (
    get_candidate_representation,
    get_candidate_representation_ids,
    get_context_representation,
    get_context_representation_ids,
)
from anncur_tpu.models.native_tokenizer import NativeWordPieceTokenizer
from anncur_tpu.models.tokenizer import WordPieceTokenizer, make_test_vocab

WORDS = ["alpha", "beta", "gamma", "delta", "mention", "title", "desc", "long"]

SAMPLES = [
    {"mention": "alpha beta", "context_left": "gamma " * 40, "context_right": "delta"},
    {"mention": "alpha", "context_left": "", "context_right": "beta " * 40},
    {"mention": "", "context_left": "gamma", "context_right": "delta"},
    {"mention": "naïve café", "context_left": "gamma", "context_right": "delta"},  # unicode
]


@pytest.fixture(scope="module", params=["python", "native"])
def tokenizer(request):
    vocab = make_test_vocab(WORDS)
    if request.param == "native":
        tok = NativeWordPieceTokenizer(vocab)
        if not tok.native_available:
            pytest.skip("no native lib")
        return tok
    return WordPieceTokenizer(vocab)


@pytest.mark.parametrize("sample", SAMPLES)
def test_context_ids_match(tokenizer, sample):
    want = get_context_representation(sample, tokenizer, 32)["ids"]
    got = get_context_representation_ids(sample, tokenizer, 32)
    assert got == want


@pytest.mark.parametrize("title", [None, "alpha title", "naïve"])
def test_candidate_ids_match(tokenizer, title):
    want = get_candidate_representation("desc long gamma " * 10, tokenizer, 24, title)["ids"]
    got = get_candidate_representation_ids("desc long gamma " * 10, tokenizer, 24, title)
    assert got == want
