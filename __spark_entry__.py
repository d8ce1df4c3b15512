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
    # ---- round-10 window (VERDICT r9 Next-round #1/#5: STALEST-FIRST +
    # plan-fingerprint staleness guard) ----
    # Shape: 5 r10 slots (q_substring_dedup/q_substring_scrub/
    # q_substring_sparse/q_suffix_rank NEW; q_memorization plan changed
    # — two-level census, hashes unchanged, re-earning its row)
    # + 10 stale-plan rows the new tools/plan_ledger.py guard surfaced
    # (8 whose PLANS.md row drifted since their last driver-green round
    # via r8/r9 shared-infra edits, plus q_ivf_pq/q_nprobe_sweep whose
    # plans the r10 scratch-staging rewrote; all VANILLA-green locally)
    # + the 34 r4-era rows pre-attested at r9 close (q_surprisal is BOTH
    # r4-era and stale-plan) + the alphabetically-first r5-era row
    # = 50. The remaining 44 r5-era rows rotate in r11 (q_containment is
    # r5-era AND stale-plan, already above the line in Block 2) —
    # pre-attested at r10 close in fresh VANILLA sf0.01 sessions (the
    # 43-row tail in one session 43/43, q_activity_gaps in the final
    # window-candidate re-verifications).
    # Block 1 — r10 new/changed plans.
    "q_substring_dedup", "q_substring_scrub", "q_substring_sparse",
    "q_suffix_rank", "q_memorization",
    # Block 2 — stale-plan rows (tests/test_plan_ledger.py forces these
    # above the budget line until a driver round re-attests them).
    # q_ivf_pq/q_nprobe_sweep re-enter after the r10 scratch-staging of
    # the shared scored core (26/24 exchanges -> 8/7, hashes unchanged).
    "q_bfs_dist", "q_containment", "q_jaccard_est", "q_label_prop",
    "q_modularity", "q_pagerank", "q_textrank", "q_triangles",
    "q_ivf_pq", "q_nprobe_sweep",
    # Block 3 — r4-era rows (newest driver row = round 4), alphabetical.
    "q_fuzzy", "q_grouping_sets", "q_higher_order", "q_histogram",
    "q_incr_agg", "q_lateral",
    "q_len_quantile", "q_line_dedup", "q_mix_sample", "q_nullsafe",
    "q_pack", "q_part_margin", "q_percentile", "q_pii_scrub", "q_pmi",
    "q_recursive", "q_regex", "q_sessionize", "q_setops_all", "q_split",
    "q_stats", "q_stats2", "q_string2", "q_supplier_balance",
    "q_supplier_rev", "q_surprisal", "q_temperature_mix",
    "q_template_spectrum", "q_time_bucket", "q_token_budget",
    "q_trycast_format", "q_values", "q_window_dist", "q_window_range",
    # Block 4 — oldest r5-era row, alphabetical.
    "q_ab_test",
    # ---- window budget line: entries below here are OUTSIDE the first-50
    # window for r10 and rotate in r11 (the r5-era tail) ----
    "q_activity_gaps", "q_ann_recall", "q_audio_energy", "q_autocorr", "q_bigram_surprisal",
    "q_bm25", "q_canon_dedup_gain", "q_cdc_chunk", "q_cluster_sizes",
    "q_column_profile", "q_compaction_plan", "q_decay_sum",
    "q_dedup_yield", "q_embed_dims", "q_entropy", "q_erasure",
    "q_first_touch", "q_funnel_timing", "q_heaps_law", "q_histogram2d",
    "q_kmv_join_est", "q_kmv_merge", "q_lang_confusion", "q_leakage",
    "q_mixture_diversity", "q_ner_default_empty", "q_normalize_audit",
    "q_out_of_order", "q_pack_efficiency", "q_phrase_search",
    "q_quality_gate", "q_rolling_7d", "q_rrf_fusion",
    "q_seasonal_profile", "q_skew_audit", "q_source_overlap",
    "q_source_stream", "q_stream_cdc", "q_topk_salted", "q_transitions",
    "q_velocity_anomaly", "q_vocab_coverage", "q_watermark_sizing",
    "q_winsorize",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.update(QUERIES)  # remainder in registration order; no dupes (dict)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
