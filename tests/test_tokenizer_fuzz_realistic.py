"""Realistic-scale tokenizer fuzz: a ~28k-entry vocab shaped like
bert-base-uncased (same special-token layout, multi-char pieces,
accents/greek/cyrillic/CJK single chars, ##-continuations). The real
30,522-token vocab is unobtainable here (zero egress; see PARITY.md) —
this exercises every WordPiece code path it would, against
transformers.BertTokenizer executed on the same vocab file."""

import pytest
from hypothesis import given, settings, strategies as st

from anncur_tpu.models.native_tokenizer import NativeWordPieceTokenizer
from anncur_tpu.models.tokenizer import WordPieceTokenizer, make_realistic_vocab

REAL_VOCAB = make_realistic_vocab()


@pytest.fixture(scope="module")
def hf_real():
    import os
    import tempfile

    from transformers import BertTokenizer

    d = tempfile.mkdtemp()
    path = os.path.join(d, "vocab.txt")
    WordPieceTokenizer(REAL_VOCAB).save_vocab(path)
    return BertTokenizer(vocab_file=path, do_lower_case=True)


@pytest.fixture(scope="module")
def ours_real():
    return WordPieceTokenizer(REAL_VOCAB)


@pytest.fixture(scope="module")
def native_real():
    tok = NativeWordPieceTokenizer(REAL_VOCAB)
    if not tok.native_available:
        pytest.skip("no native lib")
    return tok


def test_realistic_vocab_layout():
    assert REAL_VOCAB["[PAD]"] == 0
    assert REAL_VOCAB["[unused0]"] == 1
    assert REAL_VOCAB["[UNK]"] == 100
    assert REAL_VOCAB["[CLS]"] == 101
    assert REAL_VOCAB["[SEP]"] == 102
    assert REAL_VOCAB["[MASK]"] == 103
    assert len(REAL_VOCAB) >= 28000


RICH_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("Lu", "Ll", "Nd", "Po", "Zs", "Ps", "Pe", "Sm", "So", "Mn", "Lo"),
    ),
    max_size=80,
)


@settings(max_examples=400, deadline=None)
@given(RICH_TEXT)
def test_python_matches_hf_realistic(ours_real, hf_real, text):
    assert ours_real.tokenize(text) == hf_real.tokenize(text)


@settings(max_examples=400, deadline=None)
@given(RICH_TEXT)
def test_native_matches_python_realistic(ours_real, native_real, text):
    assert native_real.encode(text) == ours_real.encode(text)


@pytest.mark.parametrize(
    "text",
    [
        "The [unused0] quick café's naïve 株式会社 résumé!!",
        "word" * 60,  # >100-char word -> single [UNK]
        "stación 北京 Ψυχή привет ​�",
        "don't-stop 3.14159 a.b.c [CLS] [SEP] [MASK]",
        "control  chars",
        "ﬁnest ﬂow ß ñ",  # ligatures / sharp-s / tilde-n
    ],
)
def test_adversarial_cases_match_hf(ours_real, hf_real, text):
    assert ours_real.tokenize(text) == hf_real.tokenize(text)
    assert ours_real.encode(text) == hf_real.convert_tokens_to_ids(
        hf_real.tokenize(text)
    )
