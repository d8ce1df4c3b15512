"""Session cache hygiene (VERDICT r6 #5).

Query builders persist() intermediates that feed multiple branches of one
plan (band tables, shared graphs, signature frames). Within one query that
is correct and LRU-evictable, but the builders return LAZY DataFrames, so
they cannot unpersist before the caller has collected — and a long-lived
session running the whole corpus accumulates cached plans. This module is
the release half of the contract: harnesses (selfcheck, notebooks, any
long-lived driver) call release_caches() BETWEEN queries.

Correctness is unaffected either way: persist() registers with Spark's
CacheManager, and an InMemoryRelation recomputes evicted blocks from
lineage on a miss. What release_caches() buys is deterministic storage
accounting — the sweep ends with ZERO persisted RDDs instead of relying on
LRU pressure."""

from __future__ import annotations

from pyspark.sql import SparkSession


def release_caches(spark: SparkSession) -> int:
    """Drop ALL executor-cached state this engine created; return how many
    persistent RDDs were released.

    Four layers, in dependency order:
    1. the Python-side DataFrame memos AND the registry plan cache (so
       nothing re-serves a plan that references blocks about to vanish —
       a cached q_dedup_clusters plan holds a LogicalRDD over its final
       localCheckpoint, which CANNOT recompute once unpersisted; next use
       rebuilds from scratch),
    2. spark.catalog.clearCache() — every CacheManager entry (persist()ed
       DataFrames, cached tables),
    3. stray persistent RDDs left outside the CacheManager —
       localCheckpoint materializations whose Python references died but
       whose blocks await the ContextCleaner (connected_components rounds'
       final labels) — unpersisted directly via the JVM map.
    """
    from ..operators import components, pq, round7, round10
    from .registry import clear_plan_cache

    components._GRAPH_CACHE.clear()
    components._DIRN_CACHE.clear()
    round7._LP_CACHE.clear()
    pq._IVFPQ_CORE_CACHE.clear()
    round10._SSD_SPANS_CACHE.clear()
    round10._SUFR_ROUNDS_CACHE.clear()
    round10._SUFLCP_CACHE.clear()
    clear_plan_cache()
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for jrdd in list(jmap.values()):  # py4j exposes the java map dict-like
        jrdd.rdd().unpersist(False)
        n += 1
    return n


def persistent_rdd_count(spark: SparkSession) -> int:
    """How many RDDs currently hold persisted blocks (the VERDICT r6 #5
    done-criterion: a sweep must end at 0 after release_caches)."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()
