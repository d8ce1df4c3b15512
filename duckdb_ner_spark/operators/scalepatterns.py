"""Scale patterns for operations OSS Spark has no native fast path for:
bucketed interval (range) joins and MERGE-style upserts.

Scale notes (100 TB):
- q_range_bucket: a naive interval join is a non-equi join ⇒ Spark plans a
  broadcast nested-loop (or cartesian) — O(|probe| × |intervals|). The
  bucketed form explodes each interval into its covered hour buckets and
  equi-joins on the bucket, then refines with the exact BETWEEN — a plain
  shuffled/broadcast hash join whose cost is O(|probe| + Σ interval-hours),
  the standard time-series decomposition. Bucket width is the tuning knob:
  width ≈ median interval length keeps the explode factor ~2×.
- q_upsert: the MERGE pattern without a table format: changes ⟗ base on the
  key, coalesce(change, base) — one co-partitioned full-outer join. With the
  base bucketed by key (see q_bucket_join) the join is shuffle-free on the
  base side, which is how a 100 TB compaction actually runs; table formats
  (Delta/Iceberg) wrap exactly this plan in transaction metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import declared
from ..sources.catalog import load_tables

# --------------------------------------------------------------------------
# Bucketed range join: incident windows × events
# --------------------------------------------------------------------------

INCIDENT_STEP = 200  # every Nth event opens a 2-hour incident window

_RANGE_ORACLE = f"""
    WITH inc AS (
        SELECT event_id AS inc_id, ts AS s, ts + INTERVAL 2 HOUR AS e
        FROM events WHERE event_id % {INCIDENT_STEP} = 0
    )
    SELECT inc.inc_id,
           COUNT(ev.event_id) AS n_events,
           COUNT(DISTINCT ev.user_id) AS n_users
    FROM inc LEFT JOIN events ev ON ev.ts >= inc.s AND ev.ts < inc.e
    GROUP BY inc.inc_id
"""


@declared("q_range_bucket", oracle=_RANGE_ORACLE)
def q_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join via hour-bucket decomposition: each 2-hour incident
    window explodes into its ≤3 covered hour buckets; events equi-join on
    their own hour bucket; the exact [s, e) predicate refines. Result ==
    the oracle's plain non-equi join, plan == a hash join — no nested-loop
    anywhere (asserted in tests/test_scalepatterns.py). An event matches an
    incident through exactly one bucket (its own hour), so the refinement
    needs no dedup. LEFT join keeps empty windows at n_events = 0."""
    t = load_tables(spark, sf_dir)
    inc = t.events.filter(F.col("event_id") % INCIDENT_STEP == 0).select(
        F.col("event_id").alias("inc_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
    )
    inc_b = inc.select(
        "inc_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("s")),
                F.date_trunc("hour", F.col("e")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket"),
    )
    ev = t.events.select(
        F.col("event_id").alias("ev_id"),
        F.col("user_id"),
        F.col("ts").alias("ev_ts"),
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
    )
    joined = inc_b.join(
        ev,
        (inc_b.bucket == ev.bucket) & (ev.ev_ts >= inc_b.s) & (ev.ev_ts < inc_b.e),
        "left",
    )
    return joined.groupBy("inc_id").agg(
        F.count("ev_id").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# MERGE-style upsert (update + insert batch applied to a base table)
# --------------------------------------------------------------------------

UPSERT_TOUCH = 100  # every Nth order gets a price revision
UPSERT_NEW = 50_000_000  # key offset for inserted rows

_UPSERT_ORACLE = f"""
    WITH merged AS (
        -- updates: every {UPSERT_TOUCH}th order re-priced ×1.1 (decimal-exact)
        SELECT o_orderpriority,
               CASE WHEN o_orderkey % {UPSERT_TOUCH} = 0
                    THEN CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(2,1))
                    ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS price,
               CASE WHEN o_orderkey % {UPSERT_TOUCH} = 0 THEN 1 ELSE 0 END AS updated
        FROM orders
        UNION ALL
        -- inserts: one synthetic order per re-priced key
        SELECT 'NEW', CAST(100.00 AS DECIMAL(12,2)), 0
        FROM orders WHERE o_orderkey % {UPSERT_TOUCH} = 0
    )
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(updated) AS BIGINT) AS n_updated,
           CAST(ROUND(SUM(price), 2) AS DOUBLE) AS total_price
    FROM merged
    GROUP BY o_orderpriority
"""


@declared("q_upsert", oracle=_UPSERT_ORACLE)
def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO expressed as a full-outer join: a change batch (price
    revisions for every 100th order + brand-new synthetic orders) is applied
    to the base with coalesce(change, base) per column — matched rows take
    the change, unmatched changes insert, unmatched base passes through.
    Price math stays in the decimal domain end to end (double×1.1 would be
    engine-identical IEEE but its decimal re-cast could land on a midpoint;
    decimal×decimal is exact). The oracle replays the merge as UNION ALL +
    CASE — same multiset, orthogonal formulation."""
    t = load_tables(spark, sf_dir)
    base = t.orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    touched = base.filter(F.col("o_orderkey") % UPSERT_TOUCH == 0)
    changes = touched.select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("price") * F.lit("1.1").cast("decimal(2,1)")).alias("price"),
        F.lit(1).alias("updated"),
    ).unionByName(
        touched.select(
            (F.col("o_orderkey") + UPSERT_NEW).alias("o_orderkey"),
            F.lit("NEW").alias("o_orderpriority"),
            F.lit("100.00").cast("decimal(12,2)").alias("price"),
            F.lit(0).alias("updated"),
        )
    )
    merged = base.alias("b").join(
        changes.alias("c"), on="o_orderkey", how="full_outer"
    ).select(
        F.coalesce(F.col("c.o_orderpriority"), F.col("b.o_orderpriority")).alias(
            "o_orderpriority"
        ),
        F.coalesce(F.col("c.price"), F.col("b.price")).alias("price"),
        F.coalesce(F.col("c.updated"), F.lit(0)).alias("updated"),
    )
    return merged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("updated").cast("bigint").alias("n_updated"),
        F.round(F.sum("price"), 2).cast("double").alias("total_price"),
    )


# --------------------------------------------------------------------------
# Salted skewed aggregation (deterministic two-level spray/collapse)
# --------------------------------------------------------------------------

_SALTED_ORACLE = """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_returnflag
"""


@declared("q_skew_salted", oracle=_SALTED_ORACLE)
def q_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-aggregation handling the oracle gate can verify: l_returnflag
    has only 3 values — the degenerate-cardinality case where a direct
    groupBy leaves 3 reducers doing all the work and AQE cannot help (it
    splits skewed JOIN partitions, not hot groupBy keys). The salted form
    (plans/skew.py) sprays each key over 16 deterministic salt buckets,
    partially aggregates, then collapses — result provably identical to the
    oracle's direct GROUP BY because decimal sums are order-insensitive.
    At 100 TB this is the shape for any hot-key rollup (per-language corpus
    stats, per-source counts)."""
    from ..plans.skew import salted_agg_sum

    t = load_tables(spark, sf_dir)
    df = t.lineitem.select(
        "l_returnflag", F.col("l_quantity").cast("decimal(12,2)").alias("q")
    )
    out = salted_agg_sum(df, ["l_returnflag"], "q", n_salts=16, count_alias="n",
                         sum_alias="total_qty")
    return out.select(
        "l_returnflag", "n", F.round("total_qty", 2).cast("double").alias("total_qty")
    )


# --------------------------------------------------------------------------
# Hopping (sliding) windows — each event lands in length/slide windows
# --------------------------------------------------------------------------

_HOP_ORACLE = """
    WITH starts AS (
        SELECT event_type, value,
               unnest([TIME_BUCKET(INTERVAL 30 MINUTE, ts),
                       TIME_BUCKET(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
                   AS ws
        FROM events
    )
    SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
    FROM starts
    GROUP BY 1, 2
"""


@declared("q_hop_window", oracle=_HOP_ORACLE)
def q_hop_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation (1-hour windows every 30 minutes): Spark's
    native sliding window() — each event contributes to length/slide = 2
    windows. The oracle replays the window assignment by explicit bucket
    arithmetic (an event's covering windows start at its 30-min bucket and
    one slide earlier); both engines epoch-align sub-day buckets, which
    q_time_bucket already pins for the tumbling case. Same plan shape as any
    windowed rollup: explode ×2 then one shuffle on (window, type)."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# SCD2 dimension build: change log -> versioned rows with validity ranges
# --------------------------------------------------------------------------

_SCD2_ORACLE = """
    WITH d AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ), r AS (
        SELECT user_id, event_type, ts,
               SUM(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run_id
        FROM d
    ), v AS (
        SELECT user_id, run_id, event_type,
               MIN(ts) AS vf, COUNT(*) AS n_events
        FROM r GROUP BY user_id, run_id, event_type
    )
    SELECT user_id, event_type,
           STRFTIME(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           STRFTIME(LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf, run_id),
                    '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf, run_id) IS NULL AS is_current,
           n_events
    FROM v
"""


@declared("q_scd2", oracle=_SCD2_ORACLE)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build from a change log: collapse
    each user's consecutive run of the same event_type into one versioned
    row with [valid_from, valid_to) and an is_current flag — the standard
    dimension-build pattern a warehouse MERGE pipeline maintains.

    Scale notes (100 TB): everything is keyed on the entity id — one shuffle
    (windows and the run aggregate share the user_id partitioning, Catalyst
    reuses the exchange); skew = the longest single entity history, the
    irreducible lower bound for order-dependent versioning. Microsecond-
    precision validity bounds printed fixed-width on both engines.

    Tie order is PINNED (ADVICE r3): event_id is the secondary sort key in
    the run-segmentation window (and run_id in the validity window) in BOTH
    engines, so duplicate per-user timestamps in a regenerated dataset
    cannot silently diverge; test_scd2_duplicate_ts_ties pins the semantics
    on a synthetic tie corpus."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    runs = t.events.select("user_id", "event_type", "ts", "event_id").withColumn(
        "run_id",
        F.sum(
            F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
        ).over(w),
    )
    vers = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts").alias("vf"), F.count("*").alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("vf", "run_id")
    nxt = F.lead("vf").over(w2)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return vers.select(
        "user_id",
        "event_type",
        F.date_format("vf", fmt).alias("valid_from"),
        F.date_format(nxt, fmt).alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "n_events",
    )


# --------------------------------------------------------------------------
# Join-key skew audit (pre-flight diagnostic for salting / skew-join hints)
# --------------------------------------------------------------------------

SKEW_TOP_K = 10

_SKEW_AUDIT_ORACLE = f"""
    WITH per_key AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM per_key
    ), ranked AS (
        SELECT p.user_id, CAST(p.n AS BIGINT) AS n, t.total, t.n_keys,
               ROW_NUMBER() OVER (ORDER BY p.n DESC, p.user_id) AS rnk,
               CAST(SUM(p.n) OVER (ORDER BY p.n DESC, p.user_id) AS BIGINT) AS cum_n
        FROM per_key p CROSS JOIN tot t
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, user_id, n,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           CAST(cum_n AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
           CAST(n * n_keys AS DOUBLE) / CAST(total AS DOUBLE) AS x_mean
    FROM ranked WHERE rnk <= {SKEW_TOP_K}
"""


@declared("q_skew_audit", oracle=_SKEW_AUDIT_ORACLE)
def q_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit — the pre-flight diagnostic for q_skew_salted and
    AQE skew-join tuning: the top-10 heaviest events.user_id keys with their
    row share, cumulative share, and multiple-of-mean (x_mean is the number
    AQE's skewedPartitionFactor compares against; keys with x_mean above the
    planned salt count need a bigger spray). Production loops run this on a
    deterministic sample before every big join of a new dataset — the cost
    of discovering skew here is one combiner-friendly aggregate; the cost of
    discovering it mid-shuffle is a straggler executor an hour in.

    Engine-exactness: all ratios divide exact bigint sums once; the ranking
    total order is pinned by (n DESC, user_id).

    Scale notes (100 TB): per-key counts are the canonical map-side-combine
    aggregate (the combiner collapses the hot key BEFORE the shuffle, so the
    audit itself cannot be skewed by the skew it measures); the ranking is a
    TakeOrdered top-K (per-partition K-row heaps merged on the driver — NO
    global window over key-cardinality rows), and rnk/cum_n are computed
    inside the K surviving rows. cum_n over the top-K equals the global
    running sum at those ranks because rank r's prefix only touches the top
    r rows. For billion-key corpora the same shape over a hash-sampled key
    subset bounds it further."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql.window import Window

    per_key = t.events.groupBy("user_id").agg(F.count("*").alias("n"))
    tot = per_key.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_keys"),
    )
    # TakeOrdered plans as per-partition top-K heaps; the window below then
    # runs over exactly SKEW_TOP_K rows (the q_cte/q_topk pattern), never
    # over the full key set.
    topk = per_key.orderBy(F.col("n").desc(), "user_id").limit(SKEW_TOP_K)
    win = Window.orderBy(F.col("n").desc(), "user_id")
    ranked = (
        topk.crossJoin(F.broadcast(tot))
        .withColumn("rnk", F.row_number().over(win))
        .withColumn("cum_n", F.sum("n").over(win).cast("bigint"))
    )
    total_d = F.col("total").cast("double")
    return ranked.filter(F.col("rnk") <= SKEW_TOP_K).select(
        F.col("rnk").cast("bigint").alias("rnk"),
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / total_d).alias("share"),
        (F.col("cum_n").cast("double") / total_d).alias("cum_share"),
        ((F.col("n") * F.col("n_keys")).cast("double") / total_d).alias("x_mean"),
    )


# --------------------------------------------------------------------------
# Ordered funnel analysis (view -> click -> purchase)
# --------------------------------------------------------------------------

_FUNNEL_ORACLE = """
    WITH e1 AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ), e2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM e1
    ), e3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                      OVER (PARTITION BY user_id) AS t3
        FROM e2
    ), per_user AS (
        SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
        FROM e3 GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t1) AS BIGINT) AS n_view,
           CAST(COUNT(t2) AS BIGINT) AS n_click,
           CAST(COUNT(t3) AS BIGINT) AS n_purchase,
           COUNT(t2) * 1.0 / COUNT(t1) AS view_to_click,
           COUNT(t3) * 1.0 / COUNT(t2) AS click_to_purchase,
           COUNT(t3) * 1.0 / COUNT(t1) AS overall_conv
    FROM per_user
"""


@declared("q_funnel", oracle=_FUNNEL_ORACLE)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view -> click -> purchase): a step counts only
    if it happens STRICTLY AFTER the user's previous step — the sequential
    dependency that separates a funnel from three independent filters. Each
    stage timestamp is the user's earliest qualifying event given the prior
    stage (t1 = first view; t2 = first click after t1; t3 = first purchase
    after t2).

    Plan shape (the 100 TB point): ONE shuffle of the events table — the
    three stage computations are stacked unordered window aggregates over
    the same user_id partitioning, and the per-user collapse reuses that
    partitioning (no second event-level exchange); only user-level rows
    reach the final 1-row aggregate. The naive form is three self-joins =
    three shuffles of the full fact table.

    Engine-exactness: stage timestamps are MIN over exact microsecond
    values; conversion rates are int*1.0/int — a single correctly-rounded
    division on identical operands."""
    t = load_tables(spark, sf_dir)
    per_user = funnel_user_stages(t.events)
    c1, c2, c3 = F.count("t1"), F.count("t2"), F.count("t3")
    return per_user.agg(
        F.count("*").cast("bigint").alias("n_users"),
        c1.cast("bigint").alias("n_view"),
        c2.cast("bigint").alias("n_click"),
        c3.cast("bigint").alias("n_purchase"),
        (c2 * F.lit(1.0) / c1).alias("view_to_click"),
        (c3 * F.lit(1.0) / c2).alias("click_to_purchase"),
        (c3 * F.lit(1.0) / c1).alias("overall_conv"),
    )


def funnel_user_stages(events: DataFrame) -> DataFrame:
    """Per-user funnel stage timestamps (user_id, t1, t2, t3) on an
    arbitrary events frame — q_funnel's windowed core, factored out for
    property tests."""
    w = Window.partitionBy("user_id")
    e = (
        events.select("user_id", "ts", "event_type")
        .withColumn(
            "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return e.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )


# --------------------------------------------------------------------------
# Cohort retention (weekly cohorts x weekly activity offsets)
# --------------------------------------------------------------------------

# Fixed well-before-any-data anchor: offsets stay non-negative, so integer
# division is floor in both engines (DuckDB // floors, Spark div truncates
# toward zero — they only agree on non-negatives; a data-relative anchor
# could go negative under testdata regeneration).
COHORT_ANCHOR = "DATE '2000-01-03'"  # a Monday


_COHORT_ORACLE = f"""
    WITH f AS (
        SELECT user_id, ts,
               MIN(ts) OVER (PARTITION BY user_id) AS first_ts
        FROM events
    ), d AS (
        SELECT DISTINCT user_id,
               datediff('day', {COHORT_ANCHOR}, CAST(first_ts AS DATE)) // 7
                   AS cohort_id,
               datediff('day', CAST(first_ts AS DATE), CAST(ts AS DATE)) // 7
                   AS week_offset
        FROM f
    ), g AS (
        SELECT cohort_id, week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        FROM d GROUP BY cohort_id, week_offset
    )
    SELECT CAST(cohort_id AS BIGINT) AS cohort_id,
           CAST(week_offset AS BIGINT) AS week_offset,
           n_active,
           CAST(MAX(CASE WHEN week_offset = 0 THEN n_active END)
                    OVER (PARTITION BY cohort_id) AS BIGINT) AS n_cohort,
           n_active * 1.0 / MAX(CASE WHEN week_offset = 0 THEN n_active END)
                                OVER (PARTITION BY cohort_id) AS retention
    FROM g
"""


@declared("q_cohort_retention", oracle=_COHORT_ORACLE)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the week of their
    first event, activity is bucketed by whole weeks since that first
    event, and each (cohort, offset) cell reports distinct active users
    against the cohort's size (its offset-0 cell — every user is active in
    their own first week by construction, so offset 0 IS the cohort
    census). The classic growth-analytics triangle.

    Engine-exactness: week ids are pure integer arithmetic on day diffs
    from a fixed pre-data anchor (non-negative, so floor-vs-truncate
    division divergence cannot bite — see COHORT_ANCHOR note); retention is
    int*1.0/int.

    Plan shape (100 TB): first-event timestamps ride the user_id
    partitioning (window min — one events shuffle); the DISTINCT collapses
    event-level rows to (user, cohort, offset) BEFORE the count-distinct
    aggregate, and the cohort-size lookup is a window over the tiny
    aggregated triangle, not a second pass over events."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id")
    f = t.events.select("user_id", "ts").withColumn("first_ts", F.min("ts").over(w))
    d = f.select(
        "user_id",
        F.expr(f"datediff(CAST(first_ts AS DATE), {COHORT_ANCHOR}) div 7").alias(
            "cohort_id"
        ),
        F.expr("datediff(CAST(ts AS DATE), CAST(first_ts AS DATE)) div 7").alias(
            "week_offset"
        ),
    ).distinct()
    g = d.groupBy("cohort_id", "week_offset").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_active")
    )
    wc = Window.partitionBy("cohort_id")
    census = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(wc)
    return g.select(
        F.col("cohort_id").cast("bigint").alias("cohort_id"),
        F.col("week_offset").cast("bigint").alias("week_offset"),
        "n_active",
        census.cast("bigint").alias("n_cohort"),
        (F.col("n_active") * F.lit(1.0) / census).alias("retention"),
    )


# --------------------------------------------------------------------------
# Last-touch attribution (event-to-event as-of via RANGE-frame window)
# --------------------------------------------------------------------------

_ATTRIBUTION_ORACLE = """
    WITH e AS (
        SELECT event_id, user_id, ts, event_type,
               MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS view_ts
        FROM events
    )
    SELECT event_id, user_id,
           ts AS purchase_ts, view_ts,
           epoch_us(ts) - epoch_us(view_ts) AS gap_us
    FROM e
    WHERE event_type = 'purchase' AND view_ts IS NOT NULL
"""


@declared("q_attribution", oracle=_ATTRIBUTION_ORACLE)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent view at-or-before it — the event-to-event as-of join of
    marketing analytics, expressed as ONE pass over the events fact.

    Tie determinism: the frame is RANGE (not ROWS) UNBOUNDED PRECEDING —
    a view sharing the purchase's exact timestamp is always inside the
    frame regardless of how the sort breaks the tie, so both engines see
    the identical frame contents (a ROWS frame would make same-microsecond
    ties an ordering lottery). Gap is exact integer microseconds
    (epoch_us/unix_micros) — no datediff boundary-counting semantics to
    diverge between engines.

    Plan shape (100 TB): one events shuffle (user_id partitioning for the
    running-max window), then a narrow filter; the naive form is a
    purchases-x-views non-equi self-join."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = t.events.select("event_id", "user_id", "ts", "event_type").withColumn(
        "view_ts",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    return e.filter(
        (F.col("event_type") == "purchase") & F.col("view_ts").isNotNull()
    ).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "view_ts",
        F.expr("timestampdiff(MICROSECOND, view_ts, ts)").alias("gap_us"),
    )


# --------------------------------------------------------------------------
# Incremental aggregate maintenance (mergeable partial state)
# --------------------------------------------------------------------------

INCR_AGG_SPLIT = "TIMESTAMP '2024-01-15 00:00:00'"
INCR_FX = 1_000_000  # value fixed-point scale (sum order independence)


_INCR_AGG_ORACLE = f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * {INCR_FX}) AS BIGINT)) AS BIGINT) AS total_fx,
           SUM(CAST(ROUND(value * {INCR_FX}) AS BIGINT)) * 1.0
               / (COUNT(*) * {INCR_FX}) AS avg_value
    FROM events
    GROUP BY event_type
"""


@declared("q_incr_agg", oracle=_INCR_AGG_ORACLE)
def q_incr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the engine computes per-type
    totals as OLD STATE (events before a cutoff) merged with a NEW BATCH
    (events at/after it) — the two-phase partial-state shape of an
    incremental pipeline or materialized-view refresh — and must equal the
    oracle's direct one-pass aggregate. COUNT and SUM are mergeable
    partials; AVG is derived at read time from the merged sums (never
    merged itself — the classic incremental-view rule).

    Engine-exactness: values are quantized to 1e6 fixed-point BIGINT before
    summing, so the merge order (old+new vs one pass) and the shuffle's
    accumulation order cannot produce ulp drift; avg is one exact integer
    expression divided once.

    Plan shape (100 TB): each phase is a combiner-friendly aggregate over
    its time slice (partition pruning applies when events are date-
    partitioned); the merge re-aggregates a types-count-sized union."""
    t = load_tables(spark, sf_dir)
    fx = F.expr(f"CAST(ROUND(value * {INCR_FX}) AS BIGINT)")
    cutoff = F.expr(INCR_AGG_SPLIT)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(fx).cast("bigint").alias("total_fx"),
        )

    old_state = partial(t.events.filter(F.col("ts") < cutoff))
    new_batch = partial(t.events.filter(F.col("ts") >= cutoff))
    merged = (
        old_state.unionByName(new_batch)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("total_fx").cast("bigint").alias("total_fx"),
        )
    )
    return merged.select(
        "event_type",
        "n_events",
        "total_fx",
        (F.col("total_fx") * F.lit(1.0) / (F.col("n_events") * F.lit(INCR_FX))).alias(
            "avg_value"
        ),
    )


# --------------------------------------------------------------------------
# Per-user rolling time-window features (RANGE frame on integer microseconds)
# --------------------------------------------------------------------------

ROLL_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7 days in microseconds
ROLL_FX = 1_000_000  # value fixed-point scale


_ROLLING_ORACLE = f"""
    WITH e AS (
        SELECT event_id, user_id, ts,
               epoch_us(ts) AS ts_us,
               CAST(ROUND(value * {ROLL_FX}) AS BIGINT) AS v_fx
        FROM events
    )
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
           CAST(SUM(v_fx) OVER w AS BIGINT) AS value_7d_fx
    FROM e
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts_us
        RANGE BETWEEN {ROLL_WINDOW_US} PRECEDING AND CURRENT ROW
    )
"""


@declared("q_rolling_7d", oracle=_ROLLING_ORACLE)
def q_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 7-day activity features at every event — trailing
    event count and value sum — the feature-engineering pass behind
    velocity/abuse signals and activity models.

    Engine-exactness: the frame is a RANGE window over INTEGER epoch
    microseconds (epoch_us/timestampdiff from the epoch), so both engines
    evaluate the identical integer interval — no engine INTERVAL-arithmetic
    or tie-order hazard (RANGE includes all same-microsecond rows on both
    frame edges regardless of sort tiebreak); values are summed in 1e6
    fixed-point BIGINT.

    Plan shape (100 TB): one events shuffle (user_id partitioning), one
    per-partition ordered pass — Spark's WindowExec maintains the sliding
    frame incrementally; the naive form is a self-join on the time band
    (q_range_bucket's problem, needed only when the band join is BETWEEN
    two different tables)."""
    t = load_tables(spark, sf_dir)
    e = t.events.select(
        "event_id",
        "user_id",
        "ts",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)").alias(
            "ts_us"
        ),
        F.expr(f"CAST(ROUND(value * {ROLL_FX}) AS BIGINT)").alias("v_fx"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ROLL_WINDOW_US, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).cast("bigint").alias("n_7d"),
        F.sum("v_fx").over(w).cast("bigint").alias("value_7d_fx"),
    )


# --------------------------------------------------------------------------
# A/B experiment readout (two-proportion z, engine-exact)
# --------------------------------------------------------------------------

_AB_ORACLE = """
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       > SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS conv
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
        FROM per_user
    )
    SELECT n0, c0, c0 * 1.0 / NULLIF(n0, 0) AS rate0,
           n1, c1, c1 * 1.0 / NULLIF(n1, 0) AS rate1,
           (c0 * 1.0 / NULLIF(n0, 0) - c1 * 1.0 / NULLIF(n1, 0))
             / NULLIF(SQRT((c0 + c1) * 1.0 / (n0 + n1)
                    * (1.0 - (c0 + c1) * 1.0 / (n0 + n1))
                    * (1.0 / NULLIF(n0, 0) + 1.0 / NULLIF(n1, 0))), 0) AS z,
           ABS((c0 * 1.0 / NULLIF(n0, 0) - c1 * 1.0 / NULLIF(n1, 0))
             / NULLIF(SQRT((c0 + c1) * 1.0 / (n0 + n1)
                    * (1.0 - (c0 + c1) * 1.0 / (n0 + n1))
                    * (1.0 / NULLIF(n0, 0) + 1.0 / NULLIF(n1, 0))), 0)) > 1.96
               AS significant
    FROM arms
"""


@declared("q_ab_test", oracle=_AB_ORACLE)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split into two arms by a deterministic
    key hash (user_id parity — production uses the md5-threshold trick),
    per-arm conversion = a per-user outcome predicate (here "more purchases
    than clicks" — chosen because it stays non-degenerate at every testdata
    SF, where "any purchase" saturates to 100%; a real experiment plugs in
    its own predicate), and the two-proportion pooled
    z-statistic with the |z| > 1.96 call — the standard experiment-analysis
    rollup.

    Engine-exactness: the z formula chains correctly-rounded double ops
    (divisions, one sqrt — the IEEE-exact transcendental) over exact
    integer counts, with the IDENTICAL parenthesized expression tree on
    both engines, so the result is bit-equal without any rounding.

    Plan shape (100 TB): per-user conversion is one combiner-friendly
    aggregate over events; everything after runs on a 2-row (here 1-row
    pivoted) table."""
    t = load_tables(spark, sf_dir)
    n_p = F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
    n_c = F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
    per_user = t.events.groupBy("user_id").agg(
        F.when(n_p > n_c, 1).otherwise(0).alias("conv")
    )
    arms = per_user.select(
        (F.col("user_id") % 2).cast("bigint").alias("arm"), "conv"
    ).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("c1"),
    )
    # 1e0, not 1.0: Spark SQL parses the literal 1.0 as DECIMAL(2,1) (DuckDB
    # as DOUBLE) — the decimal division would change both dtype and rounding
    # NULLIF guards: an empty arm or a zero-variance outcome (p = 0 or 1)
    # yields NULL, not an ANSI divide-by-zero — undefined experiment, not a
    # crashed job (same guard on the oracle side)
    z = F.expr(
        "(c0 * 1e0 / NULLIF(n0, 0) - c1 * 1e0 / NULLIF(n1, 0))"
        " / NULLIF(SQRT((c0 + c1) * 1e0 / (n0 + n1)"
        "        * (1e0 - (c0 + c1) * 1e0 / (n0 + n1))"
        "        * (1e0 / NULLIF(n0, 0) + 1e0 / NULLIF(n1, 0))), 0)"
    )
    return arms.select(
        "n0",
        "c0",
        F.expr("c0 * 1e0 / NULLIF(n0, 0)").alias("rate0"),
        "n1",
        "c1",
        F.expr("c1 * 1e0 / NULLIF(n1, 0)").alias("rate1"),
        z.alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
    )


# --------------------------------------------------------------------------
# Funnel step timing (exact percentile of integer-microsecond deltas)
# --------------------------------------------------------------------------

_FUNNEL_TIMING_ORACLE = """
    WITH e1 AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ), e2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM e1
    ), e3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                      OVER (PARTITION BY user_id) AS t3
        FROM e2
    ), per_user AS (
        SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
        FROM e3 GROUP BY user_id
    ), deltas AS (
        SELECT epoch_us(t2) - epoch_us(t1) AS d12_us,
               epoch_us(t3) - epoch_us(t2) AS d23_us,
               epoch_us(t3) - epoch_us(t1) AS d13_us
        FROM per_user WHERE t3 IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_completed,
           CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY d12_us) AS BIGINT)
               AS median_view_to_click_us,
           CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY d23_us) AS BIGINT)
               AS median_click_to_purchase_us,
           CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY d13_us) AS BIGINT)
               AS p90_overall_us
    FROM deltas
"""


@declared("q_funnel_timing", oracle=_FUNNEL_TIMING_ORACLE)
def q_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step timing: for users who complete the full
    view→click→purchase sequence, the median per-step delay and the p90
    end-to-end delay — the latency half of funnel analysis (q_funnel is the
    conversion half; both share funnel_user_stages' single-shuffle core).

    Engine-exactness: deltas are exact integer microseconds
    (epoch_us/timestampdiff), and PERCENTILE_DISC returns actual elements —
    no interpolation arithmetic anywhere."""
    t = load_tables(spark, sf_dir)
    deltas = (
        funnel_user_stages(t.events)
        .filter(F.col("t3").isNotNull())
        .select(
            F.expr("timestampdiff(MICROSECOND, t1, t2)").alias("d12_us"),
            F.expr("timestampdiff(MICROSECOND, t2, t3)").alias("d23_us"),
            F.expr("timestampdiff(MICROSECOND, t1, t3)").alias("d13_us"),
        )
    )
    return deltas.agg(
        F.count("*").cast("bigint").alias("n_completed"),
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d12_us) AS BIGINT)"
        ).alias("median_view_to_click_us"),
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d23_us) AS BIGINT)"
        ).alias("median_click_to_purchase_us"),
        F.expr(
            "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY d13_us) AS BIGINT)"
        ).alias("p90_overall_us"),
    )


# --------------------------------------------------------------------------
# Activity-gap profiling (gaps-and-islands over integer hour indices)
# --------------------------------------------------------------------------

_GAPS_ORACLE = """
    WITH h AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hour_idx
        FROM events
    ), g AS (
        SELECT user_id, hour_idx,
               hour_idx - LAG(hour_idx) OVER (PARTITION BY user_id ORDER BY hour_idx) - 1
                   AS gap
        FROM h
    )
    SELECT user_id,
           CAST(MIN(hour_idx) AS BIGINT) AS first_hour,
           CAST(MAX(hour_idx) AS BIGINT) AS last_hour,
           CAST(MAX(hour_idx) - MIN(hour_idx) + 1 AS BIGINT) AS span_hours,
           CAST(COUNT(*) AS BIGINT) AS active_hours,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_hours,
           COUNT(*) * 1.0 / (MAX(hour_idx) - MIN(hour_idx) + 1) AS coverage
    FROM g GROUP BY user_id
"""


@declared("q_activity_gaps", oracle=_GAPS_ORACLE)
def q_activity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity-gap profile: distinct active hours, the covered
    span, the longest inactivity streak, and the coverage ratio — the
    gaps-and-islands statistic behind retention/abuse heuristics and the
    planning input for time-series gap filling (how much zero-fill a
    resample would create).

    Engine-exactness: hours are pure integer epoch indices
    (epoch_us div 3.6e9 — no timezone or DST arithmetic), gaps are LAG
    diffs over that unique-per-user integer (total order, no tie hazard),
    and coverage is one int*1.0/int division.

    Plan shape (100 TB): DISTINCT collapses events to (user, hour) BEFORE
    any window — the event stream shuffles once on user_id and everything
    downstream is per-user-cardinality."""
    t = load_tables(spark, sf_dir)
    h = (
        t.events.select(
            "user_id",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                " div 3600000000"
            ).alias("hour_idx"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("hour_idx")
    g = h.withColumn("gap", F.col("hour_idx") - F.lag("hour_idx").over(w) - 1)
    return g.groupBy("user_id").agg(
        F.min("hour_idx").cast("bigint").alias("first_hour"),
        F.max("hour_idx").cast("bigint").alias("last_hour"),
        (F.max("hour_idx") - F.min("hour_idx") + 1).cast("bigint").alias("span_hours"),
        F.count("*").cast("bigint").alias("active_hours"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("bigint").alias("max_gap_hours"),
        (F.count("*") * F.lit(1.0) / (F.max("hour_idx") - F.min("hour_idx") + 1)).alias(
            "coverage"
        ),
    )


# --------------------------------------------------------------------------
# Skew-safe per-group top-k (two-phase salted rank)
# --------------------------------------------------------------------------

TOPK_SALT = 4
TOPK_PER_GROUP = 3

_TOPK_SALTED_ORACLE = f"""
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars, rk FROM (
        SELECT source, doc_id, n_chars,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
        FROM documents
    ) WHERE rk <= {TOPK_PER_GROUP}
"""


@declared("q_topk_salted", oracle=_TOPK_SALTED_ORACLE)
def q_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k with a TWO-PHASE SALTED rank — the skew-safe form of
    q_window_rank's per-group window. A plain PARTITION BY source window
    puts every row of a hot group through one task (the CommonCrawl-domain
    problem); here phase 1 ranks within (source, salt = doc_id % {TOPK_SALT})
    partitions and keeps k rows each — a hot group splits across
    {TOPK_SALT} parallel tasks — and phase 2 re-ranks only the ≤ k·salt
    survivors per group. Phase-1 per-salt top-k is a superset of the global
    top-k (any global top row is also top-k within its own salt), so the
    result is EXACTLY the unsalted rank — which is what the oracle runs.

    Engine-exactness: pure integers; the total order (n_chars DESC, doc_id)
    is salt-independent.

    Scale notes (100 TB): max window-partition size drops from |hot group|
    to |hot group| / {TOPK_SALT} in phase 1; phase 2 touches k·{TOPK_SALT}
    rows per group. Generalizes to any per-group aggregate with a mergeable
    partial (this is the manual form of what map-side combine does for
    associative aggregates, applied to rank, which has none)."""
    t = load_tables(spark, sf_dir)
    d = t.documents.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        (F.col("doc_id") % TOPK_SALT).alias("salt"),
    )
    w1 = Window.partitionBy("source", "salt").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    phase1 = (
        d.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= TOPK_PER_GROUP)
        .drop("r1", "salt")
    )
    w2 = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        phase1.withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rk") <= TOPK_PER_GROUP)
        .select("source", "doc_id", "n_chars", "rk")
    )


# --------------------------------------------------------------------------
# Event-time disorder audit (late-data diagnostic for streaming ingest)
# --------------------------------------------------------------------------

_OOO_ORACLE = """
    WITH e AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS ts_us,
               MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ts_us < hwm_us THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(COALESCE(MAX(CASE WHEN ts_us < hwm_us THEN hwm_us - ts_us END), 0)
                AS BIGINT) AS max_lateness_us
    FROM e GROUP BY user_id
"""


def event_lateness(events: DataFrame) -> DataFrame:
    """(user_id, event_id, ts) → + ts_us / hwm_us / lateness_us (0 when
    on-time; first event per user has NULL hwm and lateness 0). The shared
    core of q_out_of_order and q_watermark_sizing, factored so tests can
    drive it with PLANTED disorder — the shipped testdata is globally
    time-ordered (streaming/events.py invariant), so on it both queries
    legitimately report zero lateness."""
    e = events.select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return e.withColumn("hwm_us", F.max("ts_us").over(w)).withColumn(
        "lateness_us",
        F.when(
            F.col("ts_us") < F.col("hwm_us"), F.col("hwm_us") - F.col("ts_us")
        ).otherwise(F.lit(0).cast("bigint")),
    )


@declared("q_out_of_order", oracle=_OOO_ORACLE)
def q_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder audit: per user, how many events arrived with a
    timestamp OLDER than the user's high-water mark at that point in the
    append order (event_id), and the worst lateness. This is the
    measurement that SIZES a streaming watermark — withWatermark's delay
    should cover the observed p99.9 lateness, and this audit is how you
    know it (guessing low silently drops late rows; guessing high bloats
    state).

    Engine-exactness: the high-water mark is a MAX over integer epoch
    microseconds in a ROWS frame ending 1 PRECEDING — first event per user
    gets NULL (never late, matching the stream semantics that the first
    arrival defines the watermark); lateness is integer subtraction.

    Scale notes (100 TB): one events shuffle (user_id), one ordered pass
    per partition; the aggregate collapses to per-user rows before any
    further processing. The window is partitioned — never global."""
    t = load_tables(spark, sf_dir)
    marked = event_lateness(t.events)
    late = F.when(F.col("lateness_us") > 0, 1).otherwise(0)
    return marked.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(late).cast("bigint").alias("n_late"),
        F.max("lateness_us").cast("bigint").alias("max_lateness_us"),
    )


# --------------------------------------------------------------------------
# Event-type transition matrix (first-order behavioral Markov counts)
# --------------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS prev_type
        FROM events
    ), pair AS (
        SELECT prev_type, event_type AS next_type FROM seq
        WHERE prev_type IS NOT NULL
    ), tot AS (
        SELECT prev_type, CAST(COUNT(*) AS BIGINT) AS n_from
        FROM pair GROUP BY prev_type
    )
    SELECT p.prev_type, p.next_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           t.n_from,
           COUNT(*) * 1e0 / t.n_from AS p_next
    FROM pair p JOIN tot t ON p.prev_type = t.prev_type
    GROUP BY p.prev_type, p.next_type, t.n_from
"""


@declared("q_transitions", oracle=_TRANSITIONS_ORACLE)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix: for each (prev → next)
    pair of consecutive per-user events, the count and the conditional
    probability P(next | prev) — the behavioral Markov model behind
    next-action prediction, funnel-anomaly alerts, and bot detection
    (bots have near-deterministic rows in this matrix; humans don't).

    Engine-exactness: the sequence order is pinned by (epoch_us, event_id)
    — integer keys, no timestamp tie ambiguity; probabilities are single
    1e0 divisions of exact BIGINT counts.

    Scale notes (100 TB): one events shuffle (user_id partitioning) for the
    LAG, then combiner aggregates onto a (types × types)-sized matrix; the
    conditional join broadcasts the types-sized row-total table."""
    t = load_tables(spark, sf_dir)
    e = t.events.select(
        "user_id",
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pair = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select("prev_type", F.col("event_type").alias("next_type"))
    )
    tot = pair.groupBy("prev_type").agg(F.count("*").cast("bigint").alias("n_from"))
    return (
        pair.groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("bigint").alias("n"))
        .join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            "n_from",
            F.expr("n * 1e0 / n_from").alias("p_next"),
        )
    )


# --------------------------------------------------------------------------
# Watermark sizing: drop-rate as a function of allowed lateness
# --------------------------------------------------------------------------

WATERMARK_MENU_S = (0, 60, 3600)  # candidate withWatermark delays (seconds)

_WM_ORACLE = f"""
    WITH e AS (
        SELECT user_id,
               epoch_us(ts) AS ts_us,
               MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm_us
        FROM events
    ), late AS (
        SELECT CASE WHEN ts_us < hwm_us THEN hwm_us - ts_us ELSE 0 END AS lateness_us
        FROM e
    ), menu AS (
        SELECT unnest([{", ".join(str(w) for w in WATERMARK_MENU_S)}]) AS w_seconds
    )
    SELECT CAST(m.w_seconds AS BIGINT) AS w_seconds,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN l.lateness_us > CAST(m.w_seconds AS BIGINT) * 1000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           SUM(CASE WHEN l.lateness_us > CAST(m.w_seconds AS BIGINT) * 1000000
               THEN 1 ELSE 0 END) * 1e0 / COUNT(*) AS drop_rate
    FROM menu m CROSS JOIN late l
    GROUP BY m.w_seconds
"""


@declared("q_watermark_sizing", oracle=_WM_ORACLE)
def q_watermark_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing table: for each candidate withWatermark delay, how
    many events would be DROPPED as too-late (lateness beyond the delay,
    measured against the per-user append-order high-water mark — the
    q_out_of_order statistic turned into the decision table). This is the
    choose-your-tradeoff readout: delay 0 drops every out-of-order row;
    the cheapest delay with acceptable drop-rate is the watermark to ship.

    Engine-exactness: integer epoch-µs lateness vs integer thresholds; one
    1e0 division per menu row.

    Scale notes (100 TB): the lateness pass is q_out_of_order's single
    user-partitioned window; the 3-row menu is a JVM-side literal relation
    cross-joined in (no Python boundary), and the aggregate is
    map-side-combined per menu row."""
    t = load_tables(spark, sf_dir)
    late = event_lateness(t.events).select("lateness_us")
    menu = spark.range(1).select(
        F.explode(F.array(*[F.lit(w_) for w_ in WATERMARK_MENU_S])).alias("w_seconds")
    )
    dropped = F.when(
        F.col("lateness_us") > F.col("w_seconds").cast("bigint") * 1000000, 1
    ).otherwise(0)
    return (
        F.broadcast(menu)
        .crossJoin(late)
        .groupBy("w_seconds")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(dropped).cast("bigint").alias("n_dropped"),
            (F.sum(dropped) * F.lit(1.0) / F.count("*")).alias("drop_rate"),
        )
        .select(
            F.col("w_seconds").cast("bigint").alias("w_seconds"),
            "n_events",
            "n_dropped",
            "drop_rate",
        )
    )


# --------------------------------------------------------------------------
# Hourly-series autocorrelation (seasonality diagnostics)
# --------------------------------------------------------------------------

AUTOCORR_LAGS = (1, 2, 3, 6, 12, 24)  # hours

_AUTOCORR_ORACLE = f"""
    WITH hourly AS (
        SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ), lags AS (
        SELECT unnest([{", ".join(str(k) for k in AUTOCORR_LAGS)}]) AS k
    ), pairs AS (
        SELECT l.k, a.c AS x, b.c AS y
        FROM lags l
        JOIN hourly a ON TRUE
        JOIN hourly b ON b.h = a.h + l.k
    )
    SELECT CAST(k AS BIGINT) AS lag_h,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           (COUNT(*) * 1e0 * SUM(x * y) - SUM(x) * 1e0 * SUM(y))
             / (SQRT(COUNT(*) * 1e0 * SUM(x * x) - SUM(x) * 1e0 * SUM(x))
                * SQRT(COUNT(*) * 1e0 * SUM(y * y) - SUM(y) * 1e0 * SUM(y)))
               AS autocorr
    FROM pairs GROUP BY k
"""


@declared("q_autocorr", oracle=_AUTOCORR_ORACLE)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at a menu of lags —
    the seasonality diagnostic behind anomaly detection baselines and
    capacity planning (a strong lag-24 peak means build a
    same-hour-yesterday baseline; no structure means a flat threshold is
    the best you can do).

    Engine-exactness: hour ids and counts are exact integers; Pearson uses
    the moment formula over BIGINT sums (the q_stats pattern) with sqrt —
    the bit-exact transcendental — and fixed-order double arithmetic.

    Scale notes (100 TB): the corpus collapses to the HOURLY table (one
    combiner aggregate) before anything else; the lag self-join and the
    correlation run on that tiny series (8.8k rows/year), so the menu of
    lags costs nothing corpus-sized."""
    t = load_tables(spark, sf_dir)
    hourly = (
        t.events.select(
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                " div 3600000000"
            ).alias("h")
        )
        .groupBy("h")
        .agg(F.count("*").cast("bigint").alias("c"))
        .persist()  # both sides of every lag join
    )
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in AUTOCORR_LAGS])).alias("k")
    )
    a = hourly.select(F.col("h").alias("ha"), F.col("c").alias("x"))
    b = hourly.select(F.col("h").alias("hb"), F.col("c").alias("y"))
    pairs = (
        F.broadcast(lags)
        .join(a, F.expr("TRUE"))
        .join(b, F.expr("hb = ha + k"))
        .select("k", "x", "y")
    )
    n = F.count("*")
    sx, sy = F.sum("x"), F.sum("y")
    sxx = F.sum(F.expr("x * x"))
    syy = F.sum(F.expr("y * y"))
    sxy = F.sum(F.expr("x * y"))
    corr = (n * F.lit(1.0) * sxy - sx * F.lit(1.0) * sy) / (
        F.sqrt(n * F.lit(1.0) * sxx - sx * F.lit(1.0) * sx)
        * F.sqrt(n * F.lit(1.0) * syy - sy * F.lit(1.0) * sy)
    )
    return pairs.groupBy("k").agg(
        n.cast("bigint").alias("n_pairs"), corr.alias("autocorr")
    ).select(F.col("k").cast("bigint").alias("lag_h"), "n_pairs", "autocorr")


# --------------------------------------------------------------------------
# Per-user daily-velocity anomaly scores (abuse/bot triage)
# --------------------------------------------------------------------------

VELOCITY_TOP = 25

_VELOCITY_ORACLE = f"""
    WITH daily AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s1,
               CAST(SUM(c * c) AS BIGINT) AS s2
        FROM daily
    ), scored AS (
        SELECT d.user_id, d.day, d.c,
               (d.c * 1e0 * t.n - t.s1)
                 / SQRT((t.s2 * 1e0 * t.n - t.s1 * 1e0 * t.s1)) AS z
        FROM daily d CROSS JOIN stats t
    )
    SELECT user_id, CAST(day AS BIGINT) AS day, c AS n_events, z
    FROM scored
    ORDER BY z DESC, user_id, day
    LIMIT {VELOCITY_TOP}
"""


@declared("q_velocity_anomaly", oracle=_VELOCITY_ORACLE)
def q_velocity_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-velocity anomaly triage: each (user, day) activity count scored
    against the corpus-wide daily-count distribution (z-like score from the
    moment formula), top offenders first — the first-pass bot/abuse queue.
    The z here is vs the GLOBAL (user, day) population: cheap, one pass; a
    per-user baseline variant partitions the stats by user with the same
    shape.

    Engine-exactness: daily counts are integer aggregates; the score is the
    moment formula over exact BIGINT sums (q_stats pattern: n·c − s1 over
    sqrt(n·s2 − s1²), equivalent ranking to the textbook z and exactly
    reproducible); top-k is TakeOrdered with a pinned total order.

    Scale notes (100 TB): the corpus collapses to (user, day) rows in one
    combiner aggregate; the 1-row stats broadcast back; TakeOrdered heaps
    pick the queue."""
    t = load_tables(spark, sf_dir)
    daily = (
        t.events.select(
            "user_id",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                " div 86400000000"
            ).alias("day"),
        )
        .groupBy("user_id", "day")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    stats = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.expr("c * c")).cast("bigint").alias("s2"),
    )
    scored = daily.crossJoin(F.broadcast(stats)).select(
        "user_id",
        F.col("day").cast("bigint").alias("day"),
        F.col("c").alias("n_events"),
        F.expr("(c * 1e0 * n - s1) / SQRT(s2 * 1e0 * n - s1 * 1e0 * s1)").alias("z"),
    )
    return scored.orderBy(F.col("z").desc(), "user_id", "day").limit(VELOCITY_TOP)


# --------------------------------------------------------------------------
# Exponentially decayed activity (half-life features, exact powers of two)
# --------------------------------------------------------------------------

DECAY_SHIFT_CAP = 40  # ages beyond this contribute weight 0 (2^-40 ≈ 1e-12)

_DECAY_ORACLE = f"""
    WITH daily AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), anchor AS (
        SELECT MAX(day) AS maxd FROM daily
    ), weighted AS (
        SELECT d.user_id, d.c,
               CASE WHEN a.maxd - d.day >= {DECAY_SHIFT_CAP} THEN CAST(0 AS BIGINT)
                    ELSE d.c << CAST({DECAY_SHIFT_CAP} - (a.maxd - d.day) AS INT)
               END AS w
        FROM daily d CROSS JOIN anchor a
    )
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(SUM(w) AS BIGINT) AS decayed_fx,
           SUM(w) * 1e0 / {1 << DECAY_SHIFT_CAP} AS decayed_count
    FROM weighted GROUP BY user_id
"""


@declared("q_decay_sum", oracle=_DECAY_ORACLE)
def q_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially decayed per-user activity with a 1-day half-life —
    the recency-weighted engagement feature (decayed_count = Σ c_day ·
    2^-age): yesterday counts half of today, and a burst a month ago is
    noise. The half-life form is the one decayed feature that admits EXACT
    arithmetic: weights are powers of two, so the weighted sum is an
    integer SHIFT-accumulate in 2^{DECAY_SHIFT_CAP} fixed point (no
    cross-engine exp()/pow() drift — the ln() lesson applied to decay),
    with ages ≥ {DECAY_SHIFT_CAP} days contributing exactly 0.

    Scale notes (100 TB): corpus → (user, day) combiner aggregate; the
    1-row anchor broadcasts; one more combiner aggregate to per-user rows.
    The shift-accumulate is also the MERGEABLE form: yesterday's per-user
    decayed_fx halves (one shift) and adds today's partial — the
    incremental-maintenance property q_incr_agg demonstrates for sums."""
    t = load_tables(spark, sf_dir)
    daily = (
        t.events.select(
            "user_id",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                " div 86400000000"
            ).alias("day"),
        )
        .groupBy("user_id", "day")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    anchor = daily.agg(F.max("day").alias("maxd"))
    weighted = daily.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        "c",
        F.expr(
            f"CASE WHEN maxd - day >= {DECAY_SHIFT_CAP} THEN CAST(0 AS BIGINT)"
            f" ELSE shiftleft(c, CAST({DECAY_SHIFT_CAP} - (maxd - day) AS INT)) END"
        ).alias("w"),
    )
    return weighted.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.sum("w").cast("bigint").alias("decayed_fx"),
        F.expr(f"SUM(w) * 1e0 / {1 << DECAY_SHIFT_CAP}").alias("decayed_count"),
    )


# --------------------------------------------------------------------------
# First-touch attribution (the acquisition-credit twin of q_attribution)
# --------------------------------------------------------------------------

_FIRST_TOUCH_ORACLE = """
    WITH e AS (
        SELECT event_id, user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS first_view_ts
        FROM events
    )
    SELECT event_id, user_id,
           ts AS purchase_ts, first_view_ts,
           epoch_us(ts) - epoch_us(first_view_ts) AS age_us
    FROM e
    WHERE event_type = 'purchase' AND first_view_ts IS NOT NULL
"""


@declared("q_first_touch", oracle=_FIRST_TOUCH_ORACLE)
def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every purchase credited to the user's
    EARLIEST view at-or-before it — the acquisition-credit model
    (q_attribution is the conversion-credit last-touch twin; real
    marketing stacks report both and split the difference). Same
    single-pass shape: a running MIN over the RANGE frame instead of the
    running MAX, so the tie rule and the one-events-shuffle plan carry
    over unchanged; age_us is how long the account took to convert from
    first exposure.

    Engine-exactness: RANGE frame (same-microsecond views always in-frame),
    integer-microsecond age.

    Scale notes (100 TB): identical to q_attribution — one user-partitioned
    window pass, narrow filter, no self-join."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = t.events.select("event_id", "user_id", "ts", "event_type").withColumn(
        "first_view_ts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    return e.filter(
        (F.col("event_type") == "purchase") & F.col("first_view_ts").isNotNull()
    ).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "first_view_ts",
        F.expr("timestampdiff(MICROSECOND, first_view_ts, ts)").alias("age_us"),
    )


# --------------------------------------------------------------------------
# Seasonal activity profile (day-of-week x hour-of-day matrix)
# --------------------------------------------------------------------------

_SEASONAL_ORACLE = """
    WITH e AS (
        SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
               (epoch_us(ts) % 86400000000) // 3600000000 AS hod
        FROM events
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total FROM e
    )
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(hod AS BIGINT) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n,
           COUNT(*) * 1e0 / t.total AS share
    FROM e CROSS JOIN tot t
    GROUP BY dow, hod, t.total
"""


@declared("q_seasonal_profile", oracle=_SEASONAL_ORACLE)
def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal activity profile: the day-of-week × hour-of-day event-count
    matrix with corpus shares — the companion to q_autocorr (autocorr says
    THAT there is daily/weekly structure; this says WHAT it looks like,
    and is the baseline table a same-hour-last-week anomaly detector
    indexes into).

    Engine-exactness: dow/hod derived by pure integer arithmetic on epoch
    microseconds ((days + 4) % 7 anchors 1970-01-01 = Thursday) — no
    engine calendar/locale functions (DAYOFWEEK differs in week-start
    conventions across engines); one 1e0 division for share.

    Scale notes (100 TB): one combiner aggregate onto a 7×24 matrix; the
    1-row total broadcasts."""
    t = load_tables(spark, sf_dir)
    us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    e = t.events.select(
        F.expr(f"({us} div 86400000000 + 4) % 7").alias("dow"),
        F.expr(f"({us} % 86400000000) div 3600000000").alias("hod"),
    )
    tot = e.agg(F.count("*").cast("bigint").alias("total"))
    return (
        e.crossJoin(F.broadcast(tot))
        .groupBy("dow", "hod", "total")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            F.col("dow").cast("bigint").alias("dow"),
            F.col("hod").cast("bigint").alias("hod"),
            "n",
            F.expr("n * 1e0 / total").alias("share"),
        )
    )
