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
    # round-5 rotation (VERDICT r4 Next-round #1): the 12 hash-oracled
    # queries that were added below the window in r4 and have NO driver
    # CORRECTNESS row in any round (selfcheck + judge green only). After r5
    # these 12 green rows take cumulative driver coverage to 150/150 hash
    # queries.
    "q_rolling_7d", "q_source_stream", "q_bm25", "q_ab_test",
    "q_funnel_timing", "q_compaction_plan", "q_triangles", "q_erasure",
    "q_ner_default_empty", "q_entropy", "q_vocab_coverage", "q_activity_gaps",
    # round-5 plan-shape fixes (VERDICT r4 #2-4): these queries' physical
    # plans changed this round (top-K skew rank, bounded vocab/compaction
    # windows, capped LSH verify) — hashes must stay identical, so they
    # re-enter the window for a driver re-check even though all were green
    # before.
    "q_skew_audit", "q_dedup_near",
    # round-5 new queries land here (prepend within this block as added).
    "q_phrase_search", "q_rrf_fusion", "q_cdc_chunk",
    "q_leakage", "q_containment", "q_cluster_sizes", "q_winsorize",
    "q_topk_salted", "q_out_of_order", "q_kmv_merge", "q_transitions",
    "q_stream_cdc", "q_ann_recall", "q_watermark_sizing", "q_kmv_join_est",
    "q_bigram_surprisal", "q_source_overlap", "q_embed_dims",
    "q_quality_gate", "q_autocorr", "q_audio_energy", "q_dedup_yield",
    "q_mixture_diversity", "q_normalize_audit", "q_canon_dedup_gain",
    "q_velocity_anomaly", "q_decay_sum", "q_histogram2d", "q_first_touch",
    "q_seasonal_profile", "q_degree_dist", "q_column_profile", "q_heaps_law",
    "q_pack_efficiency", "q_lang_confusion",
    # remainder: oldest-green refresh (last driver row r2) — heaviest
    # pipeline operators first (dedup/similarity/asof), then core relational
    # so no family goes two rounds unchecked.
    "q_dedup_exact", "q_dedup_incr", "q_dedup_ngram",
    "q_dedup_simhash", "q_dedup_embed", "q_dedup_clusters", "q_sim_topk",
    "q_embed_join", "q_embed_quant", "q_multimodal", "q_asof", "q_join_range",
    "q_window_frame", "q_subquery", "q_cte", "q_rollup", "q_join_outer",
    "q_agg_group", "q_agg_global", "q_join_inner", "q_join_multi",
    "q_join_semi_anti", "q_cross", "q_distinct", "q_agg_filter", "q_having",
    "q_window_rank", "q_window_lag", "q_sort", "q_topk", "q_setops",
    "q_case", "q_string", "q_date", "q_math", "q_cast", "q_array",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.update(QUERIES)  # remainder in registration order; no dupes (dict)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
