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
    # ---- round-7 window (VERDICT r6 Next-round #1-2, ADVICE r6) ----
    # NO rows-only queries this round: the driver emits err="no_oracle" for
    # them (CORRECTNESS_r06 burned 5 slots proving it) — all 50 slots below
    # are hash-checkable.
    # Block 1 — r7-new queries (prepend within this block as added).
    "q_chi2_independence",
    "q_benford", "q_cusum", "q_welch_ttest",
    "q_assortativity", "q_modularity",
    "q_emd_drift", "q_moe_router",
    "q_consistent_hash", "q_merkle",
    "q_power_iteration",
    "q_ks_drift", "q_auc",
    "q_feature_hashing", "q_postings_compression", "q_skipgram",
    "q_random_projection",
    "q_count_min", "q_hll_registers",
    "q_stream_quality_gate", "q_source_text",
    "q_curriculum", "q_memorization", "q_kneser_ney", "q_rejection_sampling",
    "q_grpo_advantage", "q_neyman_alloc", "q_fim_transform", "q_apportion", "q_preference_pairs", "q_span_corruption", "q_dialog_assembly",
    "q_bpe_merges", "q_dp_sensitivity", "q_textrank",
    "q_source_concentration", "q_drift_tvd", "q_bfs_dist",
    "q_hard_negatives", "q_stream_dedup_incr", "q_label_prop", "q_pagerank",
    "q_k_anonymity", "q_dedup_keep_best", "q_ngram_novelty",
    # Block 2 — hash-CHANGED or plan-changed this round, need fresh driver
    # rows: q_sim_ann/q_sim_ivf (integer fixed-point norms replace the
    # double-quotient quantization, ADVICE #2; sim_ann gains a hot-bucket
    # cap, ADVICE #1); q_dedup_near/q_dedup_embed/q_image_dedup (two-level
    # salted min-k bucket cap, VERDICT #2 — hash must stay identical).
    "q_sim_ann", "q_sim_ivf", "q_dedup_near", "q_dedup_embed",
    "q_image_dedup",
    # Block 3 — the 17 r2-era rows (latest driver row = round 2). With 45
    # r7-new queries in Block 1 and 5 in Block 2, the window is EXACTLY
    # full of never-green queries; ALL 17 rows here rotate to r8. HARD
    # BUDGET NOTE: the round-7 window budget is EXHAUSTED — any further
    # never-green query would push a Block-1 row outside the window and
    # fail tests/test_window_ledger.py.
    "q_array", "q_case", "q_cast", "q_date", "q_explode", "q_filter",
    "q_map", "q_math", "q_project", "q_scan", "q_setops", "q_sort",
    "q_string", "q_struct", "q_topk", "q_window_lag", "q_window_rank",
    # Block 4 — oldest r3-era rows, alphabetical. NONE fit in r7's window;
    # this whole block plus the r3 streaming block, the Block-3 tail above,
    # and the q_text_stats..q_zorder tail rotate in r8.
    "q_asof_forward", "q_bucket_join", "q_chunk", "q_embed_centroid",
    "q_fingerprint", "q_grouped_agg_udaf", "q_grouped_map",
    "q_heavy_hitters", "q_hop_window", "q_json", "q_knn_join", "q_lang_id",
    "q_multimodal_frames", "q_partition_prune", "q_pivot", "q_qualify",
    "q_quality", "q_quality_cut", "q_range_bucket", "q_repetition",
    "q_sample_det", "q_scd2", "q_schema_evolution", "q_skew_salted",
    "q_source_csv", "q_source_custom", "q_source_json", "q_source_orc",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.update(QUERIES)  # remainder in registration order; no dupes (dict)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
