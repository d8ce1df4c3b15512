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
    # ---- round-13 window (VERDICT r12 Next-round #1: rotate
    # stalest-first, mechanically — staleness = last green round across
    # CORRECTNESS_r01..r12) ----
    # Block 0 — the 6 NEW r13 queries (round13.py + q_stream_langid in
    # streaming_queries.py), never driver-checked (they displace
    # q_fim_transform, q_grpo_advantage and q_feature_hashing from
    # Block 3 below the line; those rotate in r14).
    "q_maxsim_rerank", "q_langid", "q_quality_score",
    "q_maxsim_sweep", "q_ndcg_eval", "q_stream_langid",
    # Block 1 — r13 plan/value-changed rows re-earning driver rows:
    # q_topk_bounds (certificate soundness fix, ADVICE r12 medium),
    # q_gopher_repetition (LEFT JOIN top2 — single-word docs gated),
    # q_batch_padding (arrival window de-globalized, VERDICT r12 #2),
    # q_bloom_dedup + q_rand_response (oracle digest precomputed in a
    # CTE), q_maxsim_topk (slice-unit construction factored out for
    # round13 reuse — plan identical, re-attested anyway).
    "q_topk_bounds", "q_gopher_repetition", "q_batch_padding",
    "q_bloom_dedup", "q_rand_response", "q_maxsim_topk",
    # Block 1b — r13 OPTIMIZATION plan-changed rows (values attested
    # identical at 3 SFs this round; plan_ledger requires them windowed):
    # single-level _fxsum_big aggregation (q_agg_group/q_join_range —
    # q_join_multi already sits in Block 2) and the bucket-array pair
    # generation that retired the LSH bucket self-joins (caps.py
    # bucket_array_pairs; q_dedup_near/q_dedup_embed already in Block 3).
    "q_agg_group", "q_join_range", "q_containment", "q_image_dedup",
    "q_jaccard_est", "q_lsh_recall_audit", "q_lsh_sweep", "q_sim_ann",
    "q_simhash_sweep", "q_basket_affinity",
    # Block 2 — the 21 stalest hash rows (all last green in
    # CORRECTNESS_r06; the 15 VERDICT r12 #1 named + the 6 r6-era rows
    # that sat just below the r12 line), alphabetical.
    "q_having", "q_hist_quantile", "q_image_stats",
    "q_join_cardinality", "q_join_inner", "q_join_interval",
    "q_join_multi", "q_join_outer", "q_join_semi_anti",
    "q_kmv_distinct", "q_multimodal", "q_outlier_mad", "q_rollup",
    "q_shard_shuffle", "q_sim_topk", "q_source_binary",
    "q_stream_image", "q_subquery", "q_window_frame", "q_zipf_slope",
    # Block 3 — the next-stalest tail (r7-green), alphabetical, filling
    # the window to exactly 50; the rest of the r7 cohort rotates in r14
    # (the 9 Block-1b optimization rows displaced q_consistent_hash,
    # q_count_min, q_curriculum, q_cusum, q_dedup_keep_best,
    # q_dialog_assembly, q_dp_sensitivity, q_drift_tvd, q_emd_drift
    # below the line — none of them plan-changed this round).
    "q_apportion", "q_assortativity", "q_auc", "q_benford",
    "q_bpe_merges", "q_dedup_embed",
    "q_dedup_near",
    # ---- window budget line: entries below here are OUTSIDE the first-50
    # window for r13 (each new r13 query prepended above displaces the
    # bottom row of Block 3 below this line — keep the count at exactly
    # 50 when editing) ----
    "q_chi2_independence",
    "q_consistent_hash", "q_count_min", "q_curriculum", "q_cusum",
    "q_dedup_keep_best", "q_dialog_assembly", "q_dp_sensitivity",
    "q_drift_tvd", "q_emd_drift",
    # The r12 window rows (all 50/50 green in CORRECTNESS_r12, freshest
    # in the corpus), then the prior below-line tail, then everything
    # else in registration order via queries()'s dict update.
    "q_fim_transform", "q_grpo_advantage", "q_feature_hashing",
    "q_fold_split",
    "q_zorder_prune", "q_rank_eval", "q_rfm_features",
    "q_cc_incr", "q_stream_bloom",
    "q_quant_sweep",
    "q_index_delta", "q_binary_ann", "q_wsample_priority",
    "q_vocab_diff",
    "q_quality_gate",
    "q_rolling_7d", "q_rrf_fusion", "q_seasonal_profile", "q_skew_audit",
    "q_source_overlap", "q_source_stream", "q_stream_cdc",
    "q_topk_salted", "q_transitions", "q_velocity_anomaly",
    "q_vocab_coverage", "q_watermark_sizing", "q_winsorize",
    "q_agg_filter", "q_agg_global", "q_asof",
    "q_bloom_prune", "q_cross", "q_cte", "q_dedup_clusters",
    "q_dedup_exact", "q_dedup_incr", "q_dedup_ngram", "q_dedup_simhash",
    "q_degree_dist", "q_distinct", "q_embed_cov", "q_embed_join",
    "q_embed_quant",
    "q_url_dedup",
    "q_quantile_sketch", "q_ivf_incr", "q_binary_sweep",
    "q_max_concurrency", "q_corpus_diff",
    "q_suffix_spans", "q_substring_packed", "q_substring_incr",
    "q_suffix_lcp", "q_stream_substring_incr", "q_suffix_rank",
    "q_substring_dedup", "q_substring_sparse", "q_substring_scrub",
    "q_activity_gaps", "q_ann_recall", "q_audio_energy", "q_autocorr",
    "q_bigram_surprisal",
    "q_bm25", "q_canon_dedup_gain", "q_cdc_chunk", "q_cluster_sizes",
    "q_column_profile", "q_compaction_plan", "q_decay_sum",
    "q_dedup_yield", "q_embed_dims", "q_entropy", "q_erasure",
    "q_first_touch", "q_funnel_timing", "q_heaps_law", "q_histogram2d",
    "q_kmv_join_est", "q_kmv_merge", "q_lang_confusion", "q_leakage",
    "q_mixture_diversity", "q_ner_default_empty", "q_normalize_audit",
    "q_out_of_order", "q_pack_efficiency", "q_phrase_search",
    "q_memorization",
    "q_bfs_dist", "q_label_prop",
    "q_modularity", "q_pagerank", "q_textrank", "q_triangles",
    "q_ivf_pq", "q_nprobe_sweep",
    "q_fuzzy", "q_grouping_sets", "q_higher_order", "q_histogram",
    "q_incr_agg", "q_lateral",
    "q_len_quantile", "q_line_dedup", "q_mix_sample", "q_nullsafe",
    "q_pack", "q_part_margin", "q_percentile", "q_pii_scrub", "q_pmi",
    "q_recursive", "q_regex", "q_sessionize", "q_setops_all", "q_split",
    "q_stats", "q_stats2", "q_string2", "q_supplier_balance",
    "q_supplier_rev", "q_surprisal", "q_temperature_mix",
    "q_template_spectrum", "q_time_bucket", "q_token_budget",
    "q_trycast_format", "q_values", "q_window_dist", "q_window_range",
    "q_ab_test",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY}
    ordered.update(QUERIES)  # remainder in registration order; no dupes (dict)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
