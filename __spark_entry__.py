"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship TPC-H-Q1-shape query at sf0.001 (smoke).
queries()     — every declared operator from SURVEY.md §2 (Tier C + D).
oracle_sql()  — DuckDB-runnable ANSI SQL twin for each hash-checkable query.

The declared corpus itself lives in duckdb_ner_spark.plans.registry and is
populated by importing the operator modules below.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

import duckdb_ner_spark.operators  # noqa: F401,E402  (registers declared queries)
from duckdb_ner_spark.plans.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_agg_group"](spark, "/root/testdata/sf0.001")


# The driver's CORRECTNESS gate verifies the FIRST 50 entries of queries().
# Keep that window ADVERSARIAL, not friendly (VERDICT r2 Next-round #2):
# front-load the queries the driver has never checked, riskiest first —
# streaming (the only round-2 defect), the round-1 failure set, then one-per-
# module coverage of the newest families. Stable, twice-driver-green core
# relational queries follow in registration order. New queries added in a
# round should be PREPENDED here so they land inside the window.
_DRIVER_WINDOW_PRIORITY = [
    # round-4 late additions: sampling family (per-domain cap, temperature
    # mix, quantile length filter) and cleaning family (block-level line
    # dedup, DSIR importance weights) — in-window on their first round.
    "q_domain_cap", "q_temperature_mix", "q_len_quantile",
    "q_line_dedup", "q_dsir", "q_funnel", "q_cohort_retention",
    "q_attribution", "q_incr_agg", "q_pmi",
    # round-4 additions: curation family (split/mix-budget/template-audit/
    # CCNet buckets), benchmark decontamination, sequence packing, surprisal
    # quality scoring — new queries land in-window on their first round.
    "q_split", "q_token_budget", "q_template_spectrum", "q_ccnet_bucket",
    "q_skew_audit", "q_decontam", "q_pack", "q_surprisal",
    # round-4 fixes — the r3 hash_match:false set (HUGEINT-cast defect) plus
    # the latent same-class instance q_boolagg; these MUST land in-window to
    # convert the red rows green.
    "q_boolagg", "q_pii_scrub", "q_dq_audit", "q_histogram", "q_mix_sample",
    # never-driver-checked burn-down (VERDICT r3 Next-round #3): every oracle
    # query that has zero driver rows across r1–r3, so that after r4 the
    # cumulative driver coverage is 120/120.
    "q_values", "q_cube", "q_grouping_sets", "q_recursive", "q_fuzzy",
    "q_lateral", "q_sessionize", "q_time_bucket", "q_stats", "q_stats2",
    "q_percentile", "q_asof_tol", "q_supplier_rev", "q_supplier_balance",
    "q_part_margin", "q_window_dist", "q_window_range", "q_string2",
    "q_regex", "q_date_diff", "q_higher_order", "q_nullsafe", "q_setops_all",
    "q_bitops", "q_argmax", "q_trycast_format", "q_array_setops",
    # just-below-window: the 50-slot window is exactly full (10 new + 13
    # r4-fix/curation + 27 burn-down); q_rolling_7d is selfcheck-green at
    # all three SFs and rotates in next round; q_stream_attribution is
    # rows-only (batch parity pinned in pytest) so it cedes its slot to
    # hash-checked queries.
    "q_rolling_7d", "q_stream_attribution", "q_source_stream", "q_bm25",
    "q_len_quantile_approx", "q_ab_test", "q_funnel_timing",
    "q_compaction_plan", "q_triangles", "q_erasure", "q_ner_default_empty",
    "q_entropy", "q_vocab_coverage", "q_activity_gaps",
    # oldest-green refresh (last driver row r2): the heaviest pipeline
    # operators first — dedup/similarity/asof — so no family goes two rounds
    # unchecked.
    "q_dedup_exact", "q_dedup_near", "q_dedup_incr", "q_dedup_ngram",
    "q_dedup_simhash", "q_dedup_embed", "q_dedup_clusters", "q_sim_topk",
    "q_embed_join", "q_embed_quant", "q_multimodal", "q_asof", "q_join_range",
    "q_window_frame", "q_subquery", "q_cte", "q_rollup", "q_join_outer",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.update(QUERIES)  # remainder in registration order; no dupes (dict)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
