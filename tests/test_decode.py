"""BIO-decode unit fixtures (FIXTURES.md §3 T1-T7; parity with
/root/reference/src/ner_extension.cpp:119-167)."""

import numpy as np

from duckdb_ner_spark.ner.decode import decode_entities
from duckdb_ner_spark.ner.vocab import Vocab

TOKENS = ["[CLS]", "[SEP]", "duck", "##db", "labs", "is", "in", "amsterdam", "new", "york", "sam"]
V = Vocab.from_tokens(TOKENS)
# labels: 0 O, 1 B-MISC, 2 I-MISC, 3 B-PER, 4 I-PER, 5 B-ORG, 6 I-ORG, 7 B-LOC, 8 I-LOC
O, B_MISC, I_MISC, B_PER, I_PER, B_ORG, I_ORG, B_LOC, I_LOC = range(9)


def run(tokens, labels):
    ids = [TOKENS.index(t) for t in tokens]
    logits = np.zeros((len(ids), 9), dtype=np.float32)
    for t, lb in enumerate(labels):
        logits[t, lb] = 1.0
    return decode_entities(ids, logits, V.id_to_token)


def test_t1_subword_concat_word_join():
    got = run(["[CLS]", "duck", "##db", "labs", "[SEP]"], [O, B_ORG, I_ORG, I_ORG, O])
    assert got == [("duckdb labs", "ORG")]


def test_t2_i_continuation():
    got = run(["[CLS]", "new", "york", "[SEP]"], [O, B_LOC, I_LOC, O])
    assert got == [("new york", "LOC")]


def test_t3_b_starts_new_entity_same_class():
    got = run(["[CLS]", "new", "new", "[SEP]"], [O, B_LOC, B_LOC, O])
    assert got == [("new", "LOC"), ("new", "LOC")]


def test_t4_o_flushes():
    got = run(
        ["[CLS]", "sam", "is", "in", "amsterdam", "[SEP]"],
        [O, B_PER, O, O, B_LOC, O],
    )
    assert got == [("sam", "PER"), ("amsterdam", "LOC")]


def test_t5_trailing_flush():
    got = run(["[CLS]", "amsterdam", "[SEP]"], [O, B_LOC, O])
    assert got == [("amsterdam", "LOC")]


def test_t7_bare_i_starts_entity():
    got = run(["[CLS]", "is", "york", "[SEP]"], [O, O, I_LOC, O])
    assert got == [("york", "LOC")]


def test_subword_continues_even_after_b_tag():
    # subword with B-tag of the SAME group continues (is_subword branch)
    got = run(["[CLS]", "duck", "##db", "[SEP]"], [O, B_ORG, B_ORG, O])
    assert got == [("duckdb", "ORG")]


def test_class_switch_splits():
    got = run(["[CLS]", "duck", "york", "[SEP]"], [O, B_ORG, I_LOC, O])
    assert got == [("duck", "ORG"), ("york", "LOC")]


def test_first_token_label_wins():
    # I-continuation of a different B start keeps the FIRST token's label
    got = run(["[CLS]", "new", "york", "[SEP]"], [O, B_LOC, I_LOC, O])
    assert got[0][1] == "LOC"


def test_cls_sep_do_not_touch_state():
    # entity spanning up to [SEP]: flushed by trailing rule
    got = run(["[CLS]", "new", "york", "[SEP]"], [O, B_LOC, I_LOC, B_LOC])
    assert got == [("new york", "LOC")]
