"""Tokenizer parity: our WordPiece must agree byte-for-byte with
transformers.BertTokenizer on the same vocab (SURVEY §7: recall parity
requires identical tokenization)."""

import os

import numpy as np
import pytest

from anncur_tpu.models.tokenizer import WordPieceTokenizer, make_test_vocab

SAMPLES = [
    "Hello, World! This is a test.",
    "unaffable vocabulary pieces",
    "  multiple   spaces\tand\nnewlines ",
    "naïve café résumé",  # accents
    "U.S.A. co-operate e-mail",
    "numbers 123 456.789",
    "ALLCAPS MixedCase lowercase",
    "日本語 mixed with english",  # CJK
    "punctuation!!! ??? ...",
    "",
    "a",
    "don't stop-motion \"quoted\"",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    # realistic mini-vocab with multi-char pieces and continuations
    words = [
        "hello", "world", "this", "is", "a", "test", "un", "##aff", "##able",
        "vocab", "##ulary", "piece", "##s", "multiple", "space", "and",
        "new", "##lines", "naive", "cafe", "resume", "u", "s", "co",
        "operate", "e", "mail", "123", "456", "789", "all", "##caps",
        "mixed", "##case", "lower", "with", "english", "don", "t", "stop",
        "motion", "quoted", "日", "本",
    ]
    vocab = make_test_vocab(words)
    path = tmp_path_factory.mktemp("tok") / "vocab.txt"
    toks = sorted(vocab.items(), key=lambda kv: kv[1])
    path.write_text("\n".join(t for t, _ in toks) + "\n", encoding="utf-8")
    return str(path)


@pytest.fixture(scope="module")
def ours(vocab_file):
    return WordPieceTokenizer.from_vocab_file(vocab_file, do_lower_case=True)


@pytest.fixture(scope="module")
def hf(vocab_file):
    from transformers import BertTokenizer

    return BertTokenizer(vocab_file=vocab_file, do_lower_case=True)


@pytest.mark.parametrize("text", SAMPLES)
def test_tokenize_parity(ours, hf, text):
    assert ours.tokenize(text) == hf.tokenize(text)


@pytest.mark.parametrize("text", SAMPLES)
def test_ids_parity(ours, hf, text):
    toks = ours.tokenize(text)
    assert ours.convert_tokens_to_ids(toks) == hf.convert_tokens_to_ids(toks)


def test_special_token_ids(ours):
    ids = ours.convert_tokens_to_ids(["[unused0]", "[unused1]", "[unused2]", "[PAD]"])
    assert ids == [1, 2, 3, 0]


def test_unknown_word(ours):
    assert ours.tokenize("zzzqqq")  # falls back to char pieces or UNK
    out = ours.wordpiece("@@@@")
    assert out == ["[UNK]"] or all(t in ours.vocab for t in out)


def test_vocab_roundtrip(ours, tmp_path):
    path = str(tmp_path / "v.txt")
    ours.save_vocab(path)
    again = WordPieceTokenizer.from_vocab_file(path)
    assert again.vocab == ours.vocab


def test_check_tag_ids_rejects_remapped_vocab():
    """Encoders read [unused0/1/2] at fixed ids 1/2/3 inside jit; a
    vocab mapping the tag names elsewhere must be refused up front, not
    silently read wrong positions."""
    from anncur_tpu.data.tokenization import get_candidate_representation
    from anncur_tpu.models.special_tokens import check_tag_ids
    from anncur_tpu.models.tokenizer import WordPieceTokenizer, make_test_vocab

    good = make_test_vocab()
    check_tag_ids(good)  # standard layout passes

    bad = dict(good)
    other = next(t for t in bad if not t.startswith("[") and bad[t] > 3)
    bad["[unused2]"], bad[other] = bad[other], bad["[unused2]"]
    with pytest.raises(ValueError, match="special tags"):
        check_tag_ids(bad)
    tok = WordPieceTokenizer(bad)
    with pytest.raises(ValueError, match="special tags"):
        get_candidate_representation("desc text", tok, 16, candidate_title="title")
