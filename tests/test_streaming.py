"""Structured Streaming parity: stream result == batch result."""

from tests.conftest import SF_SMOKE


def test_stream_matches_batch(spark):
    from duckdb_ner_spark.streaming.events import (
        batch_events,
        run_stream_to_memory,
        windowed_counts,
    )

    run_stream_to_memory(spark, SF_SMOKE, table_name="t_stream_out")
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.table("t_stream_out").collect()
    }
    expect = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in windowed_counts(batch_events(spark, SF_SMOKE)).collect()
    }
    assert got == expect
    assert len(expect) > 0


def test_foreach_batch_etl_roundtrip(spark, tmp_path):
    from duckdb_ner_spark.streaming.events import batch_events, run_stream_etl_to_parquet

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_stream_etl_to_parquet(spark, SF_SMOKE, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == batch_events(spark, SF_SMOKE).count()
    assert "day" in got.columns and "batch_id" in got.columns
    # idempotent replay: rerunning with the SAME checkpoint must not
    # duplicate rows (checkpoint says done; per-batch overwrite is a no-op)
    run_stream_etl_to_parquet(spark, SF_SMOKE, out, ckpt)
    assert spark.read.parquet(out).count() == got.count()


def test_streaming_dedup_matches_batch_distinct(spark):
    from duckdb_ner_spark.streaming.events import batch_events, dedup_stream, stream_events
    from duckdb_ner_spark.streaming.events import _await_drain

    q = (
        dedup_stream(stream_events(spark, SF_SMOKE), ["user_id", "event_type"])
        .select("user_id", "event_type")
        .writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_drain(q)
    got = {(r.user_id, r.event_type) for r in spark.table("t_dedup_stream").collect()}
    expect = {
        (r.user_id, r.event_type)
        for r in batch_events(spark, SF_SMOKE).select("user_id", "event_type").distinct().collect()
    }
    assert got == expect


def test_stateful_running_stats_matches_batch(spark):
    """applyInPandasWithState: the last emitted state per user must equal the
    batch aggregate over the whole table."""
    import pyspark.sql.functions as F

    from duckdb_ner_spark.streaming.events import batch_events
    from duckdb_ner_spark.streaming.stateful import run_stateful_to_memory

    run_stateful_to_memory(spark, SF_SMOKE, table_name="t_stateful_out")
    out = spark.table("t_stateful_out")
    # 'update' mode may emit one row per micro-batch per user; keep the last
    final = {
        r.user_id: (r.n_events, r.total_value)
        for r in out.orderBy("user_id", "n_events").collect()
    }
    expect = {
        r.user_id: (r.n_events, r.total_value)
        for r in batch_events(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert final == expect

def test_declared_stream_user_stats_final_state(spark):
    """The declared q_stream_user_stats (last-emission-per-user selection
    over the update-mode sink) must equal the batch per-user aggregate."""
    import pyspark.sql.functions as F

    from duckdb_ner_spark.operators.streaming_queries import q_stream_user_stats
    from duckdb_ner_spark.streaming.events import batch_events

    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in q_stream_user_stats(spark, SF_SMOKE).collect()
    }
    expect = {
        r.user_id: (r.n_events, r.total_value)
        for r in batch_events(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == expect and len(got) > 0


def test_ner_stream_matches_batch(spark):
    """The Tier-A NER UDF inside Structured Streaming: entity-label counts
    from the micro-batch drain must equal the same aggregation run in batch
    (stub model → deterministic entities)."""
    from duckdb_ner_spark.operators.ner_queries import DOC_STUB_MODEL
    from duckdb_ner_spark.streaming.ner_stream import (
        DOCS_SCHEMA,
        entity_label_counts,
        run_ner_stream_to_memory,
    )

    run_ner_stream_to_memory(
        spark, SF_SMOKE, table_name="t_ner_stream_out", model_path=DOC_STUB_MODEL
    )
    got = {(r.label): r.n for r in spark.table("t_ner_stream_out").collect()}
    batch_docs = spark.read.schema(DOCS_SCHEMA).parquet(f"{SF_SMOKE}/documents.parquet")
    expect = {
        (r.label): r.n
        for r in entity_label_counts(spark, batch_docs, DOC_STUB_MODEL).collect()
    }
    assert got == expect
    assert len(expect) > 0  # the stub model does extract entities
