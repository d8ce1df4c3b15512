"""Structured Streaming over the events table (beyond-reference surface —
the reference has no streaming, SURVEY.md §2.E; this is the Spark-native
path a production events pipeline would run).

Batch/stream parity: the same windowed aggregation expressed once, runnable
in batch or as a micro-batch stream over the parquet file source with a
watermark for late data. Tests assert stream result == batch result.

Scale notes: file-source streaming shards by file; at production scale the
source is Kafka with the identical transformation; the watermark bounds
state, and the (user_id × window) grouping is the shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType, TimestampNTZType


def _observed_events_schema(spark: SparkSession, path: str) -> StructType:
    """Streaming sources cannot infer a schema — derive it from the file's
    OWN parquet footer (driver-only, one footer read) instead of hardcoding a
    layout. The testdata has shipped ``ts`` both as INT64 TIMESTAMP(NANOS)
    (surfaced as raw longs via nanosAsLong, the only way Spark reads nanos)
    and as plain ``timestamp[us]``; baking either in silently corrupts the
    other — a µs long divided by 1000 lands every event in 1970. DuckDB reads
    both physical types natively, so layout adaptivity is the parity bar."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path).schema


def _normalize(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TIMESTAMP for the stream path, whatever the file
    layout. Watermarks hard-require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP
    _TYPE on NTZ), so unlike the batch catalog this path lands on the tz'd
    type. The session tz is UTC in this environment (and in the driver's
    vanilla harness), so both conversions below are instant-preserving and
    the windowed wall-clock results equal the batch/DuckDB NTZ replay."""
    t = df.schema["ts"].dataType
    if isinstance(t, LongType):
        # INT64-nanos layout: ns→µs truncation, exactly what DuckDB does
        # reading the same file. Integer division — ns values exceed 2^53,
        # double math drifts.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(t, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per event_type with a watermark (streaming) —
    watermark is a no-op under batch, so one definition serves both."""
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", window).alias("w"), "event_type")
        # decimal-exact sum: micro-batch accumulation must not depend on
        # float addition order, so stream == batch == any SQL oracle
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The file stream source requires a *directory* (it tails new files);
    the testdata ships one file per table, so stage it into a temp dir —
    in production the directory IS the landing zone.

    The staging dir is DETERMINISTIC per source (hash of sf_dir): re-runs
    against the same checkpoint see the same source path, so checkpoint
    resume semantics hold, and temp usage is bounded at one copy per SF."""
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"events_stream_{tag}")
    os.makedirs(stage, exist_ok=True)
    source = f"{sf_dir}/events.parquet"
    target = f"{stage}/events.parquet"
    # Refresh the staged copy whenever the source changed (mtime/size):
    # regenerated testdata at the same path must not leave batch/stream
    # parity comparing different data through a stale copy (ADVICE r1).
    if os.path.exists(target):
        s, t = os.stat(source), os.stat(target)
        if (s.st_mtime, s.st_size) != (t.st_mtime, t.st_size):
            shutil.copy2(source, target)
    else:
        shutil.copy2(source, target)
    raw = spark.readStream.schema(_observed_events_schema(spark, source)).parquet(stage)
    return _normalize(raw)


def batch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream — delegates to the engine catalog (the
    layout-adaptive, oracle-verified batch read) so stream/batch parity tests
    compare two INDEPENDENT read paths rather than a shared schema twin."""
    from ..sources.catalog import Catalog

    return Catalog(spark, sf_dir).table("events")


def run_stream_etl_to_parquet(
    spark: SparkSession, sf_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Streaming-ETL pattern via foreachBatch: each micro-batch is enriched
    with arbitrary batch-only logic (joins, dedup, upserts) and written as
    parquet. foreachBatch alone is at-least-once; the write below is made
    IDEMPOTENT by targeting a deterministic per-batch directory with
    overwrite mode — a replayed batch overwrites its own previous output,
    which together with the checkpoint yields effective exactly-once."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("day", F.to_date("ts"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    q = (
        stream_events(spark, sf_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drain(q)


def dedup_stream(events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-dedup: dropDuplicatesWithinWatermark bounds the dedup
    state to the watermark horizon — the streaming sibling of
    operators.dedup.dedup_exact. At 100 TB the horizon is the knob trading
    state size against how late a duplicate can still be caught."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def _await_drain(q, timeout: int = 300) -> None:
    """availableNow queries terminate on their own; a False return means the
    drain did NOT finish — raise instead of silently stopping mid-stream."""
    try:
        finished = q.awaitTermination(timeout)
        if not finished:
            raise TimeoutError(f"streaming drain did not finish within {timeout}s")
    finally:
        q.stop()


def run_stream_to_memory(spark: SparkSession, sf_dir: str, table_name: str = "stream_out") -> None:
    """Drain the whole file source in availableNow micro-batches into an
    in-memory sink (complete mode), then stop."""
    q = (
        windowed_counts(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await_drain(q)
