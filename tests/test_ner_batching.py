"""Cross-row batched inference + broadcast model distribution tests."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ggml_path(tmp_path_factory):
    from duckdb_ner_spark.ner.ggml_format import write_ggml
    from tools.convert_model import STUB_VOCAB, random_model

    path = str(tmp_path_factory.mktemp("bm") / "tiny.bin")
    hp, t = random_model(STUB_VOCAB, n_embd=32, n_head=4, n_layer=2, n_labels=9, n_max_tokens=64)
    write_ggml(path, hp, STUB_VOCAB, t)
    return path


def test_batched_eval_bit_identical_to_per_row(ggml_path):
    from duckdb_ner_spark.ner.model import load_model

    m = load_model(ggml_path)
    ids = m.vocab.token_to_id
    rows = [
        [ids["[CLS]"], ids["duck"], ids["labs"], ids["[SEP]"]],
        [ids["[CLS]"], ids["new"], ids["york"], ids["[SEP]"]],        # same length
        [ids["[CLS]"], ids["sam"], ids["[SEP]"]],                      # different length
        [ids["[CLS]"], ids["duck"], ids["labs"], ids["[SEP]"]],       # duplicate
    ]
    batched = m.eval_tokens_batch(rows)
    for toks, lg in zip(rows, batched):
        np.testing.assert_array_equal(lg, m.eval_tokens(toks))


def test_broadcast_model_distribution(engine, ggml_path):
    """set_model_broadcast ships weights without a shared filesystem path."""
    spark = engine.spark
    engine.set_model_broadcast(ggml_path)
    rows = spark.sql("SELECT ner('duck labs in amsterdam') AS e").collect()
    assert rows[0].e is not None  # model loaded from broadcast bytes
    # path-based and broadcast-based registration must agree
    engine.set_model_path(ggml_path)
    rows2 = spark.sql("SELECT ner('duck labs in amsterdam') AS e").collect()
    assert rows[0].e == rows2[0].e
    engine.set_model_path(None)


def test_broadcast_json_stub(engine):
    import os

    stub = os.path.join(os.path.dirname(__file__), "fixtures", "stub_model.json")
    engine.set_model_broadcast(stub)
    row = engine.spark.sql("SELECT ner('sam is in new york') AS e").collect()[0]
    assert [(e.entity, e.label) for e in row.e] == [("sam", "PER"), ("new york", "LOC")]
    engine.set_model_path(None)
