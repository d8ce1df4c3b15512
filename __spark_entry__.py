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
    # ---- round-9 window (VERDICT r8 Next-round #2/#3: STALEST-FIRST) ----
    # With all 50 r8 slots green, the stalest driver rows are the 27
    # r3-era rows + the 49 r4-era rows. Final r9 shape: 6 r9 slots (3 NEW
    # queries, the 2 PQ queries whose hashes CHANGED with the trained
    # codebook, and q_stream_cusum — the one registry query with no
    # driver row of any kind, burning a slot per VERDICT r8 #3) + all 27
    # r3-era rows + the first 17 r4-era rows alphabetically = 50. The
    # remaining 34 r4-era rows rotate in r10 (q_semdedup and q_nprobe_sweep,
    # added after the first rotation, displaced q_grouping_sets and
    # q_fuzzy below the line).
    # Block 1 — r9 slots (new / changed / never-driver-seen).
    "q_pq_assign", "q_pq_recall", "q_pq_rerank", "q_ivf_pq",
    "q_incr_minmax", "q_semdedup", "q_nprobe_sweep", "q_stream_cusum",
    # Block 2 — the 27 r3-era rows (newest driver row = round 3),
    # Python-boundary and source/layout families first.
    "q_grouped_map", "q_udtf_chunk", "q_multimodal_frames",
    "q_asof_forward", "q_chunk", "q_embed_centroid", "q_fingerprint",
    "q_heavy_hitters", "q_hop_window",
    "q_json", "q_knn_join", "q_lang_id", "q_pivot", "q_qualify",
    "q_quality", "q_quality_cut", "q_range_bucket", "q_repetition",
    "q_sample_det", "q_scd2", "q_skew_salted", "q_text_stats", "q_tfidf",
    "q_token_count", "q_unpivot", "q_upsert", "q_zorder",
    # Block 3 — r4-era rows (newest driver row = round 4), alphabetical.
    "q_argmax", "q_array_setops", "q_asof_tol", "q_attribution",
    "q_bitops", "q_boolagg", "q_ccnet_bucket", "q_cohort_retention",
    "q_cube", "q_date_diff", "q_decontam", "q_domain_cap", "q_dq_audit",
    "q_dsir", "q_funnel",
    # ---- window budget line: entries below here are OUTSIDE the first-50
    # window for r9 and rotate in r10 (the r4-era tail) ----
    "q_fuzzy", "q_grouping_sets", "q_higher_order", "q_histogram", "q_incr_agg", "q_lateral",
    "q_len_quantile", "q_line_dedup", "q_mix_sample", "q_nullsafe",
    "q_pack", "q_part_margin", "q_percentile", "q_pii_scrub", "q_pmi",
    "q_recursive", "q_regex", "q_sessionize", "q_setops_all", "q_split",
    "q_stats", "q_stats2", "q_string2", "q_supplier_balance",
    "q_supplier_rev", "q_surprisal", "q_temperature_mix",
    "q_template_spectrum", "q_time_bucket", "q_token_budget",
    "q_trycast_format", "q_values", "q_window_dist", "q_window_range",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.update(QUERIES)  # remainder in registration order; no dupes (dict)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
