"""Tokenizer unit fixtures (FIXTURES.md §3; parity with
/root/reference/src/ner_model.cpp:100-160)."""

from duckdb_ner_spark.ner.tokenizer import split_words, tokenize
from duckdb_ner_spark.ner.vocab import Vocab

# FIXTURES.md §3 stub vocab
TOKENS = ["[CLS]", "[SEP]", "duck", "##db", "labs", "is", "in", "amsterdam", "new", "york", "sam"]
V = Vocab.from_tokens(TOKENS)


def ids(*toks):
    return [TOKENS.index(t) for t in toks]


def test_split_is_whitespace_only():
    # T9: no punctuation handling, no lowercasing
    assert split_words("Duck,DB  is\tgreat\n") == ["Duck,DB", "is", "great"]


def test_full_word_and_subword_greedy():
    # "duckdb" → full-word "duck" then subword "db" (stored as ##db)
    assert tokenize(V, "duckdb labs", 512) == ids("[CLS]", "duck", "##db", "labs", "[SEP]")


def test_plain_words():
    assert tokenize(V, "new york", 512) == ids("[CLS]", "new", "york", "[SEP]")


def test_unknown_chars_skipped_bytewise_no_unk():
    # T6: "xqz" has no vocab entry at any position → skipped byte by byte
    assert tokenize(V, "xqz duck", 512) == ids("[CLS]", "duck", "[SEP]")


def test_unknown_prefix_switches_to_subword_map():
    # after skipping an unknown byte the lookup uses the SUBWORD map:
    # "xdb" → skip 'x', then "db" matches subword ##db (NOT full-word)
    assert tokenize(V, "xdb", 512) == ids("[CLS]", "##db", "[SEP]")
    # conversely "db" alone has no full-word entry and its bytes d/b have no
    # single-char subword entries either → everything skipped
    assert tokenize(V, "db", 512) == ids("[CLS]", "[SEP]")


def test_case_sensitive():
    assert tokenize(V, "Duck", 512) == ids("[CLS]", "[SEP]")  # 'D' unknown, 'uck' no match


def test_truncation_cap():
    # n_max_tokens=4: [CLS] + at most 2 pieces + [SEP]
    out = tokenize(V, "new york amsterdam sam", 4)
    assert out == ids("[CLS]", "new", "york", "[SEP]")
    assert len(out) == 4


def test_truncation_exact_boundary():
    # T8 heuristic: tokenizing to exactly n_max_tokens is indistinguishable
    # from overflow (reference checks n_tokens >= n_max_tokens AFTER capping)
    out = tokenize(V, "new york amsterdam", 4)
    assert len(out) == 4


def test_empty_string():
    assert tokenize(V, "", 512) == ids("[CLS]", "[SEP]")


def test_byte_level_skip_and_word_cache():
    """Byte-level parity (ner_model.cpp:152-155): unknown non-ASCII chars are
    skipped byte-at-a-time over the UTF-8 encoding; UTF-8 self-synchronization
    means mid-sequence offsets never match a valid-UTF-8 vocab, so ASCII
    behavior is unchanged — this pins the multi-byte skip path and the
    per-word memo cache."""
    from duckdb_ner_spark.ner.tokenizer import tokenize
    from duckdb_ner_spark.ner.vocab import Vocab

    v = Vocab.from_tokens(["[CLS]", "[SEP]", "duck", "##db", "x"])
    # '€' is 3 UTF-8 bytes, none matching: 3 single-byte skips, then 'x'
    # matches from the SUBWORD map (the word switched maps on first skip —
    # and 'x' is full-word only, so nothing is emitted for it).
    assert tokenize(v, "€x duckdb", 16) == [0, 2, 3, 1]
    # cache is populated per distinct word and reused
    assert set(v.word_cache) == {"€x", "duckdb"}
    assert tokenize(v, "duckdb duckdb", 16) == [0, 2, 3, 2, 3, 1]
