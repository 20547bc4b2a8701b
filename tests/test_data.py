"""Data layer tests: representation builders vs reference semantics,
raw loaders round-trip, tf-idf parity with sklearn."""

import numpy as np
import pytest

from anncur_tpu.data import (
    create_input_label_pair,
    get_candidate_representation,
    get_context_representation,
    get_dataset_info,
    get_zeshel_world_info,
    load_entities,
    load_mentions,
    tokenize_entities,
    tokenize_mentions,
)
from anncur_tpu.data.synthetic import make_tokenizer, make_world, write_world_files
from anncur_tpu.data.tfidf import TfidfVectorizer, compute_ent_embeds_w_tfidf


@pytest.fixture(scope="module")
def tokenizer():
    return make_tokenizer()


def test_context_representation_structure(tokenizer):
    sample = {
        "mention": "alpha beta",
        "context_left": "gamma delta " * 30,  # long left context
        "context_right": "epsilon",
    }
    rep = get_context_representation(sample, tokenizer, 32)
    assert len(rep["ids"]) == 32
    toks = rep["tokens"]
    assert toks[0] == "[CLS]" and toks[-1] == "[SEP]"
    i0, i1 = toks.index("[unused0]"), toks.index("[unused1]")
    assert i0 < i1
    assert toks[i0 + 1 : i1] == tokenizer.tokenize("alpha beta")
    # right context short -> left quota expands (reference quota balancing)
    assert toks[i1 + 1 : -1] == tokenizer.tokenize("epsilon")


def test_context_rep_quota_overflow_right(tokenizer):
    sample = {
        "mention": "alpha",
        "context_left": "beta",
        "context_right": "gamma delta " * 30,
    }
    rep = get_context_representation(sample, tokenizer, 24)
    assert len(rep["ids"]) == 24
    assert rep["ids"][-1] != 0  # fully used


def test_candidate_representation(tokenizer):
    rep = get_candidate_representation("epsilon zeta", tokenizer, 16, candidate_title="alpha")
    toks = rep["tokens"]
    assert toks[0] == "[CLS]" and toks[-1] == "[SEP]"
    assert "[unused2]" in toks
    ti = toks.index("[unused2]")
    assert toks[1:ti] == tokenizer.tokenize("alpha")
    assert len(rep["ids"]) == 16


def test_create_input_label_pair():
    pair = create_input_label_pair([101, 5, 6, 102], [101, 7, 8, 102])
    np.testing.assert_array_equal(pair, [101, 5, 6, 102, 7, 8, 102])


def test_world_files_roundtrip(tmp_path, rng):
    mentions, entities = make_world(rng, n_ents=10, n_ments=6)
    files = write_world_files(str(tmp_path), mentions, entities)
    kb2local, ents = load_entities(files["ent_file"])
    assert len(ents) == 10 and kb2local["E3"] == 3
    loaded = load_mentions(files["ment_file"], kb2local)
    assert len(loaded) == 6
    assert loaded[0]["label_id"] == mentions[0]["label_id"]
    assert loaded[0]["mention"] == mentions[0]["mention"].lower()


def test_tokenize_matrices(tokenizer, rng):
    mentions, entities = make_world(rng, n_ents=5, n_ments=4)
    mt = tokenize_mentions(mentions, tokenizer, 32)
    et = tokenize_entities(entities, tokenizer, 32)
    assert mt.shape == (4, 32) and et.shape == (5, 32)
    assert mt.dtype == np.int32
    assert (mt[:, 0] == tokenizer.vocab["[CLS]"]).all()


def test_registry():
    worlds = get_zeshel_world_info()
    assert ("test", "yugioh") in worlds and len(worlds) == 16
    info = get_dataset_info("/data", "/res", worlds, n_ment=100)
    assert "yugioh" in info
    assert info["yugioh"]["crossenc_ment_to_ent_scores"].endswith(
        "ment_to_ent_scores_n_m_100_n_e_10031_all_layers_False.pkl"
    )


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped over dogs",
    "entity linking with cross encoders",
    "tpu kernels and matrix factorization",
    "the the the repeated words words",
]


def test_tfidf_matches_sklearn():
    sk = pytest.importorskip("sklearn.feature_extraction.text")
    ours = TfidfVectorizer().fit(CORPUS)
    ref = sk.TfidfVectorizer(dtype=np.float32).fit(CORPUS)
    assert set(ours.vocabulary_) == set(ref.vocabulary_)
    got = ours.transform(CORPUS + ["fox dog unseen tokens"])
    want = ref.transform(CORPUS + ["fox dog unseen tokens"]).toarray()
    # align columns
    perm = [ours.vocabulary_[t] for t in sorted(ref.vocabulary_, key=ref.vocabulary_.get)]
    np.testing.assert_allclose(got[:, perm], want, atol=1e-6)


def test_tfidf_entity_embeds(rng):
    _, entities = make_world(rng, n_ents=8, n_ments=2)
    emb = compute_ent_embeds_w_tfidf(entities)
    assert emb.shape[0] == 8
    norms = np.linalg.norm(emb, axis=1)
    np.testing.assert_allclose(norms[norms > 0], 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Differential test vs the reference get_context_representation, executed
# directly from /root/reference (loaded at test time; never vendored).
# Covers the left_quota <= 0 slicing quirk: `context_left[-0:]` takes the
# WHOLE left context, and negative quotas drop from the front.
# ---------------------------------------------------------------------------

_REF = "/root/reference/utils/data_process.py"


def _load_reference_context_fn():
    import re

    src = open(_REF).read()
    m = re.search(
        r"^def get_context_representation\(.*?^(?=def |\Z)", src, re.S | re.M
    )
    ns = {"ENT_START_TAG": "[unused0]", "ENT_END_TAG": "[unused1]"}
    exec(compile(m.group(0), _REF, "exec"), ns)
    return ns["get_context_representation"]


@pytest.mark.skipif(not __import__("os").path.exists(_REF), reason="no reference")
@pytest.mark.parametrize(
    "mention_words,left_words,right_words,max_len",
    [
        (200, 40, 40, 128),   # mention alone exceeds max_len: negative quotas
        (126, 40, 40, 128),   # left_quota == 0 -> whole left context kept
        (120, 40, 0, 128),    # quota ~0, empty right
        (60, 100, 3, 128),    # left overflow, right underflow rebalance
        (2, 3, 100, 128),     # right overflow rebalance
        (0, 10, 10, 32),      # empty mention
        (125, 0, 7, 128),     # empty left at zero quota
    ],
)
def test_context_rep_matches_reference_exec(
    tokenizer, mention_words, left_words, right_words, max_len
):
    ref_fn = _load_reference_context_fn()
    words = [f"w{i}" for i in range(8)]
    sample = {
        "mention": " ".join(words[i % 8] for i in range(mention_words)),
        "context_left": " ".join(words[(i + 3) % 8] for i in range(left_words)),
        "context_right": " ".join(words[(i + 5) % 8] for i in range(right_words)),
    }
    ours = get_context_representation(sample, tokenizer, max_len)
    theirs = ref_fn(sample, tokenizer, max_len)
    assert ours["ids"] == theirs["ids"]
    assert ours["tokens"] == theirs["tokens"]
    # the id-level native fast path must agree too
    from anncur_tpu.data.tokenization import get_context_representation_ids

    assert get_context_representation_ids(sample, tokenizer, max_len) == theirs["ids"]


def test_load_mentions_processed_blink_schema(tmp_path):
    """The PROCESSED mention schema (what cli/preprocess_zeshel.py and
    the reference's pipeline write: mention/label_id/type keys) must
    load — load_mentions previously read only the raw-zeshel keys, so
    the real preprocess -> train pipeline crashed with KeyError."""
    import json as _json

    from anncur_tpu.data.zeshel import load_entities, load_mentions

    ent_file = tmp_path / "ents.json"
    with open(ent_file, "w") as fout:
        for i in range(3):
            fout.write(_json.dumps({"document_id": f"E{i}", "title": f"t{i}", "text": f"d{i}"}) + "\n")
    kb2local, ents = load_entities(str(ent_file))

    ment_file = tmp_path / "ments.jsonl"
    with open(ment_file, "w") as fout:
        # processed/BLINK schema
        fout.write(_json.dumps({
            "mention": "Alpha", "mention_id": "m0", "context_left": "L",
            "context_right": "R", "context_doc_id": "d", "type": "w",
            "label_id": "E1",
        }) + "\n")
        # raw-zeshel schema still accepted
        fout.write(_json.dumps({
            "text": "Beta", "mention_id": "m1", "context_left": "l",
            "context_right": "r", "context_document_id": "d", "category": "w",
            "label_document_id": "E2", "corpus": "w",
        }) + "\n")
    ments = load_mentions(str(ment_file), kb2local)
    assert len(ments) == 2
    assert ments[0]["mention"] == "alpha" and ments[0]["label_id"] == 1
    assert ments[1]["mention"] == "beta" and ments[1]["label_id"] == 2
