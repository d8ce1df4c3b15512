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
    # ---- round-8 window (VERDICT r7 Next-round #1: STALEST-FIRST) ----
    # All 244 hash-oracled queries are cumulatively driver-green, so the
    # window policy flips from "never-green first" to "stalest driver row
    # first": re-attest the rows whose newest CORRECTNESS_r* green row is
    # oldest. With every r7 slot green, the stalest set is the 17 r2-era
    # rows + the 42 r3-era rows (59 candidates for 50 slots; the r3 tail
    # rotates to r9 along with the 49 r4-era rows). Final r8 shape: 18
    # r8-new + 17 r2-era + 15 r3-era = 50.
    # Block 1 — r8-NEW hash queries (prepend as added; each new entry
    # pushes one row off the Block-3 tail into the r9 rotation —
    # tests/test_window_ledger.py enforces the never-green side).
    "q_twa", "q_skyline", "q_setsim_prefix", "q_scc", "q_incr_join",
    "q_pq_assign", "q_sink_custom", "q_lsh_recall_audit", "q_pq_recall",
    "q_stream_pipeline", "q_stream_index_growth",
    "q_bpe_apply", "q_lift_curve", "q_record_linkage", "q_bootstrap_ci",
    "q_dsar_report", "q_incr_agg_delete", "q_kcore",
    # Block 2 — the 17 r2-era rows (newest driver row = round 2).
    "q_array", "q_case", "q_cast", "q_date", "q_explode", "q_filter",
    "q_map", "q_math", "q_project", "q_scan", "q_setops", "q_sort",
    "q_string", "q_struct", "q_topk", "q_window_lag", "q_window_rank",
    # Block 3 — r3-era rows (newest driver row = round 3), riskiest
    # families first within equal staleness: streaming drains, then
    # source/layout round-trips, then Python-boundary queries, then the
    # remainder alphabetically.
    "q_stream_dedup", "q_stream_enrich", "q_stream_hop", "q_stream_join",
    "q_stream_left_join", "q_stream_session", "q_stream_window",
    "q_source_csv", "q_source_custom", "q_source_json", "q_source_orc",
    "q_schema_evolution", "q_partition_prune", "q_bucket_join",
    "q_grouped_agg_udaf", "q_grouped_map", "q_udtf_chunk",
    "q_multimodal_frames",
    "q_asof_forward", "q_chunk", "q_embed_centroid", "q_fingerprint",
    "q_heavy_hitters", "q_hop_window",
    # ---- window budget line: entries below here are OUTSIDE the first-50
    # window for r8 and rotate in r9 (with the r4-era rows after them) ----
    "q_json", "q_knn_join", "q_lang_id", "q_pivot", "q_qualify", "q_quality", "q_quality_cut", "q_range_bucket",
    "q_repetition", "q_sample_det", "q_scd2", "q_skew_salted",
    "q_text_stats", "q_tfidf", "q_token_count", "q_unpivot", "q_upsert",
    "q_zorder",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.update(QUERIES)  # remainder in registration order; no dupes (dict)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
