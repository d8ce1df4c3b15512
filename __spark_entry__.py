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
    # ---- round-6 window (VERDICT r5 Next-round #1-2) ----
    # hash-CHANGED this round (ROUND(double,n) → fixed-point BIGINT, the
    # last members of the r5 cross-engine rounding class) — must get fresh
    # driver rows:
    "q_kmv_distinct", "q_jaccard_est",
    # the 5 rows-only queries that have NEVER had a driver row (pytest-
    # pinned only): one rows_match row each closes the last coverage
    # asterisk (VERDICT r5 Missing #3).
    "q_len_quantile_approx", "q_ner_pairs", "q_stream_attribution",
    "q_stream_ner", "q_tokenizer_fertility",
    # plan-changed re-checks (hash must stay identical): q_dedup_near cap
    # rewritten as combiner min-64 aggregate (VERDICT #3); q_triangles /
    # q_degree_dist share one persisted degree table (VERDICT #6).
    "q_dedup_near", "q_triangles", "q_degree_dist",
    # round-6 new queries land here (prepend within this block as added).
    "q_image_stats", "q_sim_ann", "q_sim_ivf", "q_image_dedup",
    "q_bloom_prune", "q_zipf_slope", "q_hist_quantile", "q_embed_cov",
    "q_shard_shuffle", "q_source_binary", "q_join_interval",
    "q_stream_image", "q_outlier_mad", "q_join_cardinality",
    # remainder: oldest-green refresh — last driver row r2 for the dedup/
    # similarity block, r3-r4 for the relational tail; every r5-window query
    # earned a green row in CORRECTNESS_r05 so they cede slots safely (the
    # ledger test enforces the invariant).
    "q_dedup_exact", "q_dedup_incr", "q_dedup_ngram",
    "q_dedup_simhash", "q_dedup_embed", "q_dedup_clusters", "q_sim_topk",
    "q_embed_join", "q_embed_quant", "q_multimodal", "q_asof", "q_join_range",
    "q_window_frame", "q_subquery", "q_cte", "q_rollup", "q_join_outer",
    "q_agg_group", "q_agg_global", "q_join_inner", "q_join_multi",
    "q_join_semi_anti", "q_cross", "q_distinct", "q_agg_filter", "q_having",
    "q_window_rank", "q_window_lag", "q_sort", "q_topk", "q_setops",
    "q_case", "q_string", "q_date", "q_math", "q_cast", "q_array",
    "q_chunk", "q_repetition", "q_pii_scrub", "q_udtf_chunk",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.update(QUERIES)  # remainder in registration order; no dupes (dict)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
