"""Rows-only verification ledger (VERDICT r7 Next-round #5).

Eleven registry queries have NO DuckDB oracle by design (NER UDF output,
engine-internal sketches, seeded sampling, arbitrary streaming state). The
driver records only a weak rows-count check for them, so each one MUST be
pinned by a named exact-parity / contract pytest instead. This test makes
that ledger structural: it fails if a rows-only query is added without a
named parity test, if a ledger entry goes stale (file or test renamed), or
if a query listed here silently gains an oracle (at which point it should
leave the ledger and enter the driver-window budget).
"""

import os

import pytest

from tests.conftest import SF_SMOKE

TESTS_DIR = os.path.dirname(__file__)

# rows-only query -> (test file, test function) pinning its semantics.
ROWS_ONLY_LEDGER = {
    # NER family: no SQL twin can run the model dataflow.
    "q_ner": ("test_ner_golden.py", "test_stub_model_end_to_end_entities"),
    "q_ner_bert": (
        "test_ner_batching.py",
        "test_batched_eval_bit_identical_to_per_row",
    ),
    "q_ner_pairs": (
        "test_round5_ops.py",
        "test_ner_pairs_matches_python_recompute",
    ),
    "q_tokenizer_fertility": (
        "test_retrieval.py",
        "test_tokenizer_fertility_matches_driver_tokenize",
    ),
    # Engine-internal sketches: cross-engine hash impossible by design;
    # accuracy contract pinned instead.
    "q_approx_distinct": (
        "test_rows_only_ledger.py",
        "test_approx_distinct_error_contract",
    ),
    # (hash-verified portable twin since r11: q_quantile_sketch — bucketed
    # mergeable sketch, error-bound certificate in the verified result)
    "q_len_quantile_approx": (
        "test_pipeline_ops.py",
        "test_len_quantile_approx_rank_error_bound",
    ),
    # Seeded engine sampling: partition-layout-dependent even when seeded;
    # determinism + fraction contract pinned instead.
    "q_sample": (
        "test_rows_only_ledger.py",
        "test_sample_seeded_determinism_and_fraction",
    ),
    # Arbitrary cross-batch streaming state (applyInPandasWithState) — the
    # prompt's named non-SQL-expressible case; stream==batch parity pinned.
    "q_stream_user_stats": (
        "test_streaming.py",
        "test_declared_stream_user_stats_final_state",
    ),
    "q_stream_attribution": (
        "test_streaming.py",
        "test_stream_attribution_matches_batch",
    ),
    "q_stream_ner": (
        "test_round5_ops.py",
        "test_stream_ner_label_counts_match_batch",
    ),
    "q_stream_cusum": (
        "test_round7d_ops.py",
        "test_stream_cusum_matches_batch",
    ),
}


def test_ledger_matches_registry():
    """The ledger keys must be EXACTLY the registry's rows-only set."""
    import __spark_entry__ as e

    rows_only = {n for n in e.queries() if n not in e.oracle_sql()}
    assert rows_only == set(ROWS_ONLY_LEDGER), (
        f"rows-only registry drifted from the ledger: "
        f"unledgered={sorted(rows_only - set(ROWS_ONLY_LEDGER))} "
        f"stale={sorted(set(ROWS_ONLY_LEDGER) - rows_only)}"
    )


@pytest.mark.parametrize("name", sorted(ROWS_ONLY_LEDGER))
def test_ledger_entry_points_at_a_real_test(name):
    fname, tname = ROWS_ONLY_LEDGER[name]
    path = os.path.join(TESTS_DIR, fname)
    assert os.path.exists(path), f"{name}: ledger file {fname} missing"
    with open(path) as f:
        src = f.read()
    assert f"def {tname}(" in src, (
        f"{name}: parity test {fname}::{tname} not found — "
        f"update the ledger or restore the test"
    )


# --------------------------------------------------------------------------
# Contract tests that live here because no other file pinned them
# --------------------------------------------------------------------------
def test_sample_seeded_determinism_and_fraction(spark):
    """q_sample's contract: same seed + same input ⇒ identical row set
    within one engine (reproducible pipeline runs), and the Bernoulli
    fraction lands near 10%. Cross-engine row identity is impossible
    (Spark's sampler is partition-layout-dependent) — that is WHY the
    query is rows-only; q_sample_det is the portable twin."""
    from duckdb_ner_spark.plans.registry import QUERIES

    a = QUERIES["q_sample"](spark, SF_SMOKE).collect()
    b = QUERIES["q_sample"](spark, SF_SMOKE).collect()
    key = lambda r: (r.l_orderkey, r.l_linenumber)  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
    total = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    )
    frac = len(a) / total
    assert 0.04 < frac < 0.18, f"seeded 10% sample drew {frac:.3f}"


def test_approx_distinct_error_contract(spark):
    """q_approx_distinct's contract: the HLL++ estimate (rsd=0.02) lands
    within 5·rsd of the exact distinct count it reports alongside."""
    from duckdb_ner_spark.plans.registry import QUERIES

    row = QUERIES["q_approx_distinct"](spark, SF_SMOKE).collect()[0]
    rel_err = abs(row.approx_custkeys - row.exact_custkeys) / row.exact_custkeys
    assert rel_err <= 0.10, (
        f"approx {row.approx_custkeys} vs exact {row.exact_custkeys}: "
        f"rel err {rel_err:.3f} breaks the 2% rsd sketch contract"
    )
