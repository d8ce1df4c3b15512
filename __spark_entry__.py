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
    # round-3 additions — newest code first
    "q_scd2", "q_knn_join", "q_jaccard_est", "q_stream_hop", "q_tfidf",
    "q_multimodal_frames", "q_zorder", "q_udtf_chunk", "q_asof_forward", "q_stream_enrich", "q_stream_join", "q_stream_left_join", "q_embed_centroid",
    # streaming — newest machinery, site of the r2 defect
    "q_stream_window", "q_stream_session", "q_stream_dedup", "q_stream_user_stats",
    # round-1 failure set (driver-green exactly once, r1; slid out of window in r2)
    "q_json", "q_pivot", "q_unpivot", "q_qualify", "q_sample", "q_sample_det",
    # grouped-API pandas UDF path
    "q_grouped_map", "q_grouped_agg_udaf",
    # scale patterns
    "q_range_bucket", "q_upsert", "q_skew_salted", "q_hop_window",
    # layout + selection
    "q_partition_prune", "q_bucket_join", "q_source_orc", "q_mix_sample",
    "q_quality_cut", "q_schema_evolution",
    # sources (Spark 4 Python DataSource, csv, json)
    "q_source_custom", "q_source_csv", "q_source_json",
    # training prep
    "q_kmv_distinct", "q_chunk", "q_repetition", "q_pii_scrub", "q_dq_audit",
    "q_histogram",
    # text analysis
    "q_text_stats", "q_lang_id", "q_quality", "q_token_count",
    "q_heavy_hitters", "q_fingerprint",
    # relational extensions (multi-op compositions, judge-only-verified so far)
    "q_cube", "q_grouping_sets", "q_recursive", "q_fuzzy", "q_lateral",
    "q_sessionize", "q_time_bucket", "q_stats2", "q_asof_tol",
    "q_supplier_rev", "q_supplier_balance", "q_part_margin",
    "q_window_dist", "q_window_range",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.update(QUERIES)  # remainder in registration order; no dupes (dict)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
