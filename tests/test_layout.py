"""Physical-layout queries (operators/layout_queries.py): partition pruning,
bucketed co-located joins, and the deterministic selection stages. Plan-level
assertions pin the scale properties; value-level checks pin the selection
semantics the 100 TB design depends on."""

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_partition_pruned_scan_reads_one_year(spark):
    """The month-partitioned read-back must prune at the partition level:
    PartitionFilters carries the month predicate, and the pruned scan touches
    only the matching partition dirs."""
    from duckdb_ner_spark.operators.layout_queries import PRUNE_YEAR, q_partition_prune
    from duckdb_ner_spark.plans.inspect import formatted_plan

    df = q_partition_prune(spark, SF_SMOKE)
    plan = formatted_plan(df)
    # the month predicate must be a partition filter (pruning), not a data
    # filter (post-scan)
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[(.*?)\]", plan).group(1)
    assert "month" in pf and PRUNE_YEAR in pf
    # every returned month is within the pruned year
    months = [r.month for r in df.select("month").distinct().collect()]
    assert months and all(m.startswith(f"{PRUNE_YEAR}-") for m in months)


def test_bucket_join_has_no_exchange(spark):
    """With broadcast disabled, the bucketed lineitem⋈orders must be a
    sort-merge join over co-located buckets: zero Exchange nodes anywhere in
    the join subtree (the only exchange allowed is the final tiny group-by)."""
    from duckdb_ner_spark.operators.layout_queries import N_BUCKETS, q_bucket_join
    from duckdb_ner_spark.plans.inspect import formatted_plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_bucket_join(spark, SF_SMOKE)
        plan = formatted_plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    # bucketed scans: SelectedBucketsCount appears for both sides
    assert plan.count(f"SelectedBucketsCount: {N_BUCKETS} out of {N_BUCKETS}") >= 2
    # no shuffle below the join: the join inputs are bucket-co-located.
    # The plan section order is join-last-listed, so simply require that at
    # most ONE Exchange exists in the whole plan (the post-join group-by).
    import re

    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 1, plan


def test_mix_sample_rates_and_determinism(spark):
    """Per-language kept-rates land near the configured mix rates, and the
    selection is bit-stable across runs (hash-keyed, no RNG)."""
    from duckdb_ner_spark.operators.layout_queries import MIX_RATES, q_mix_sample

    rows = {r.lang: r for r in q_mix_sample(spark, "/root/testdata/sf0.01").collect()}
    for lang, rate in MIX_RATES.items():
        got = rows[lang].kept_rate
        # binomial σ = sqrt(p(1-p)/n); n>=64 per lang at sf0.01 → 4σ bound
        n = rows[lang].n_total
        assert abs(got - rate) < 4 * (rate * (1 - rate) / n) ** 0.5 + 0.01, (lang, got, rate)
    again = {r.lang: r for r in q_mix_sample(spark, "/root/testdata/sf0.01").collect()}
    assert {k: (v.n_kept, v.n_total) for k, v in rows.items()} == {
        k: (v.n_kept, v.n_total) for k, v in again.items()
    }


def test_quality_cut_keeps_top_half_per_lang(spark):
    from duckdb_ner_spark.operators.layout_queries import q_quality_cut

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = q_quality_cut(spark, "/root/testdata/sf0.01")
    kept_counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in totals.items():
        assert kept_counts.get(lang, 0) == n // 2, (lang, n)
    # the kept set's worst chars-per-word beats the dropped set's best,
    # within each language (rank cut is a true threshold on the score)
    scored = docs.select(
        "doc_id",
        "lang",
        (F.length("text") * F.lit(1.0) / F.size(F.split(F.col("text"), " "))).alias("s"),
    )
    j = scored.join(kept.select("doc_id").withColumn("k", F.lit(1)), "doc_id", "left")
    agg = j.groupBy("lang").agg(
        F.min(F.when(F.col("k") == 1, F.col("s"))).alias("worst_kept"),
        F.max(F.when(F.col("k").isNull(), F.col("s"))).alias("best_dropped"),
    )
    for r in agg.collect():
        assert r.worst_kept >= r.best_dropped - 1e-12, r


def test_schema_evolution_backfills_nulls(spark):
    from duckdb_ner_spark.operators.layout_queries import q_schema_evolution

    rows = {r.priority: r.n for r in q_schema_evolution(spark, SF_SMOKE).collect()}
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n_even = orders.filter(F.col("o_orderkey") % 2 == 0).count()
    assert rows["<pre-schema>"] == n_even  # the old-schema batch groups whole
    assert sum(rows.values()) == orders.count()


def test_compaction_plan_inventory_and_packing(spark):
    """q_compaction_plan: the staged layout is really one file per bucket
    (the small-files condition), every file lands in exactly one bin, bins
    cover consecutive buckets, and no bin except possibly the last starts
    without reaching the target."""
    from duckdb_ner_spark.operators.layout_queries import (
        COMPACT_BUCKETS,
        COMPACT_TARGET,
        q_compaction_plan,
    )
    from tests.conftest import SF_SMOKE

    rows = sorted(q_compaction_plan(spark, SF_SMOKE).collect(), key=lambda r: r.bin)
    assert sum(r.n_files for r in rows) == COMPACT_BUCKETS
    # consecutive, non-overlapping bucket ranges
    for a, b in zip(rows, rows[1:]):
        assert a.last_bucket + 1 == b.first_bucket
    assert rows[0].first_bucket == 0
    assert rows[-1].last_bucket == COMPACT_BUCKETS - 1
    # exact greedy recompute: bin(file) = (cum rows BEFORE file) div target
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    per_bucket = {
        b: 0 for b in range(COMPACT_BUCKETS)
    }
    for r in docs.select("doc_id").collect():
        per_bucket[r.doc_id % COMPACT_BUCKETS] += 1
    expect_bins = {}
    cum = 0
    for b in range(COMPACT_BUCKETS):
        expect_bins.setdefault(cum // COMPACT_TARGET, []).append(b)
        cum += per_bucket[b]
    got_bins = {r.bin: list(range(r.first_bucket, r.last_bucket + 1)) for r in rows}
    assert got_bins == expect_bins
    assert sum(r.n_rows for r in rows) == docs.count()
