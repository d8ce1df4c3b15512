"""Declared queries for the source/sink surface (SURVEY.md C1/C39 breadth):
custom Python DataSource, CSV and JSON round-trips.

The CSV/JSON queries write a deterministic copy of a parquet table to a
scratch directory, read it back through the respective Spark source, and
aggregate; the oracle aggregates the original parquet view — so the
round-trip (write → parse → types) is what's actually under test.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import declared
from ..sources.catalog import load_tables


@declared(
    "q_source_custom",
    cache_plan=False,
    oracle="""
    SELECT cat,
           COUNT(*) AS n,
           CAST(SUM(val) AS BIGINT) AS total_val,
           CAST(MIN(id) AS BIGINT) AS first_id
    FROM (SELECT i AS id, (i * i) % 97 AS val, 'cat_' || CAST(i % 5 AS VARCHAR) AS cat
          FROM range(1000) t(i))
    GROUP BY cat
    """,
)
def q_source_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (partitioned executor-side generation) vs a
    DuckDB range() replay of the same formula."""
    from ..sources.pydatasource import register_synthetic_source

    register_synthetic_source(spark)
    df = spark.read.format("synthetic").option("n_rows", 1000).option("n_parts", 8).load()
    return df.groupBy("cat").agg(
        F.count("*").alias("n"),
        F.sum("val").cast("bigint").alias("total_val"),
        F.min("id").cast("bigint").alias("first_id"),
    )


def _scratch(name: str, sf_dir: str) -> str:
    # keyed on the FULL source path (hashed), not the basename — distinct
    # datasets sharing a dir name must not collide
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    # os.getpid(): staging is re-run per call (cache_plan=False), and two
    # CONCURRENT processes (pytest + selfcheck on the same sf_dir) must not
    # overwrite each other's staged files mid-read — observed as a transient
    # q_schema_evolution failure when the full sweep ran beside the suite.
    # Per-pid dirs are registered for atexit removal so repeated runs don't
    # accumulate staging trees in /tmp (r4 ADVICE) — shared registry with
    # layout_queries.
    from .layout_queries import _SCRATCH_DIRS, _cleanup_scratch

    path = os.path.join(tempfile.gettempdir(), f"dns_src_{name}_{tag}_{os.getpid()}")
    if not _SCRATCH_DIRS:
        import atexit

        atexit.register(_cleanup_scratch)
    _SCRATCH_DIRS.add(path)
    return path


@declared(
    "q_source_csv",
    cache_plan=False,
    oracle="""
    SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def q_source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+source round-trip: documents → csv → parse with explicit
    schema → aggregate; must equal the parquet-truth aggregate."""
    from ..sources.writers import read_csv, write_csv

    t = load_tables(spark, sf_dir)
    path = _scratch("csv_documents", sf_dir)
    docs = t.documents.select("doc_id", "lang", "n_chars")  # text has no commas, but keep it simple
    write_csv(docs, path)
    back = read_csv(spark, path, schema="doc_id BIGINT, lang STRING, n_chars BIGINT")
    return back.groupBy("lang").agg(
        F.count("*").alias("n"), F.sum("n_chars").cast("bigint").alias("total_chars")
    )


@declared(
    "q_source_json",
    cache_plan=False,
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def q_source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+source round-trip over events (sans timestamps — JSON
    round-trips of µs timestamps are format-lossy; covered by parquet)."""
    from ..sources.writers import read_json, write_json

    t = load_tables(spark, sf_dir)
    path = _scratch("json_events", sf_dir)
    ev = t.events.select("event_id", "event_type", "value")
    write_json(ev, path)
    back = read_json(spark, path, schema="event_id BIGINT, event_type STRING, value DOUBLE")
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2).cast("double").alias("total_value"),
    )


@declared(
    "q_source_stream",
    cache_plan=False,
    oracle="""
    SELECT cat,
           COUNT(*) AS n,
           CAST(SUM(val) AS BIGINT) AS total_val,
           CAST(MAX(id) AS BIGINT) AS last_id
    FROM (SELECT i AS id, (i * i) % 97 AS val, 'cat_' || CAST(i % 5 AS VARCHAR) AS cat
          FROM range(1000) t(i))
    GROUP BY cat
    """,
)
def q_source_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python STREAMING DataSource (Spark 4
    SimpleDataSourceStreamReader): the engine-checkpointed offset cursor
    walks the deterministic generator in 250-row micro-batches (4 batches
    for 1000 rows); the drained sink must aggregate to the same answer as
    DuckDB's range() replay of the formula — proving the offset bookkeeping
    loses and duplicates nothing across batch boundaries.

    Scale notes: offsets are the source of truth (restart replays
    readBetweenOffsets), which is exactly the Kafka/file-source contract a
    production Python source implements; per-batch work happens executor-
    side, the driver only advances the cursor."""
    from ..sources.pydatasource import register_synthetic_stream_source

    register_synthetic_stream_source(spark)
    stream = (
        spark.readStream.format("synthetic_stream")
        .option("n_rows", 1000)
        .option("chunk", 250)
        .load()
    )
    name = f"dns_stream_src_{abs(hash(sf_dir)) % 10_000}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("cat")
        .agg(
            F.count("*").alias("n"),
            F.sum("val").cast("bigint").alias("total_val"),
            F.max("id").cast("bigint").alias("last_id"),
        )
    )
