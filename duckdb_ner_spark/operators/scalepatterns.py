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

from pyspark.sql import DataFrame, SparkSession
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
