"""Property-based tests (hypothesis) for the correctness-critical ported
algorithms — beyond the reference's example-based suite (SURVEY.md §5.2)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_ner_spark.ner.decode import LABEL_MAP, decode_entities
from duckdb_ner_spark.ner.tokenizer import split_words, tokenize
from duckdb_ner_spark.ner.vocab import Vocab

TOKENS = ["[CLS]", "[SEP]", "duck", "##db", "labs", "is", "in", "amsterdam", "new", "york", "sam"]
V = Vocab.from_tokens(TOKENS)

texts = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz #\t\n,."), max_size=200
)


@given(texts)
@settings(max_examples=300, deadline=None)
def test_tokenize_invariants(text):
    out = tokenize(V, text, 16)
    # [CLS] first, [SEP] last, cap respected, all ids valid
    assert out[0] == V.cls_id
    assert out[-1] == V.sep_id
    assert len(out) <= 16
    assert all(0 <= t < len(TOKENS) for t in out)


@given(texts)
@settings(max_examples=300, deadline=None)
def test_tokenize_matches_wordwise_concat(text):
    """Tokenizing word-by-word equals tokenizing the text (no cross-word
    state in the reference algorithm) — when nothing truncates."""
    full = tokenize(V, text, 10_000)
    per_word = [V.cls_id]
    for w in split_words(text):
        per_word.extend(tokenize(V, w, 10_000)[1:-1])
    per_word.append(V.sep_id)
    assert full == per_word


@given(
    st.lists(st.integers(min_value=0, max_value=len(TOKENS) - 1), min_size=2, max_size=30),
    st.data(),
)
@settings(max_examples=300, deadline=None)
def test_decode_never_crashes_and_labels_valid(token_ids, data):
    labels = [
        data.draw(st.integers(min_value=0, max_value=8)) for _ in token_ids
    ]
    logits = np.zeros((len(token_ids), 9), dtype=np.float32)
    for i, lb in enumerate(labels):
        logits[i, lb] = 1.0
    ents = decode_entities(token_ids, logits, V.id_to_token)
    for text, label in ents:
        assert label in LABEL_MAP and label != "O"
        assert text  # never empty


@given(
    st.lists(st.integers(min_value=0, max_value=len(TOKENS) - 1), min_size=2, max_size=30)
)
@settings(max_examples=200, deadline=None)
def test_decode_all_O_yields_no_entities(token_ids):
    logits = np.zeros((len(token_ids), 9), dtype=np.float32)
    logits[:, 0] = 1.0
    assert decode_entities(token_ids, logits, V.id_to_token) == []


@given(st.integers(min_value=4, max_value=40))
@settings(max_examples=50, deadline=None)
def test_truncation_monotone(cap):
    text = "new york amsterdam sam duck labs is in " * 4
    out = tokenize(V, text, cap)
    assert len(out) <= cap
    bigger = tokenize(V, text, cap + 1)
    # a larger cap extends the token stream prefix-compatibly ([SEP] aside)
    assert bigger[: len(out) - 1][: len(out) - 1][0] == out[0]
    assert out[:-1] == bigger[: len(out) - 1]


# --- shingles_expr: the zip_with-of-slices rewrite must be EXACTLY the
# naive first-occurrence-distinct n-gram construction for any word list ----

word = st.text(alphabet="abc", min_size=1, max_size=3)
word_lists = st.lists(st.lists(word, max_size=8), min_size=1, max_size=6)


def _ref_shingles(ws, n=3):
    seen, out = set(), []
    for i in range(len(ws) - n + 1):
        s = " ".join(ws[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


@given(batches=word_lists)
@settings(max_examples=15, deadline=None)
def test_shingles_expr_matches_reference(spark, batches):
    from duckdb_ner_spark.operators.textprep import shingles_expr

    df = spark.createDataFrame([(i, ws) for i, ws in enumerate(batches)], "i INT, ws ARRAY<STRING>")
    got = {r.i: list(r.sh) for r in df.select("i", shingles_expr().alias("sh")).collect()}
    expect = {i: _ref_shingles(ws) for i, ws in enumerate(batches)}
    assert got == expect
