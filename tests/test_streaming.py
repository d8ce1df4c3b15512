"""Structured Streaming parity: stream result == batch result.

The batch side of every comparison is the ENGINE CATALOG read (layout-
adaptive, verified by the driver's DuckDB-oracle gate through the batch
queries) — never a twin that shares the stream's schema derivation, so a
shared read-path bug cannot self-certify (VERDICT r2 §What's-wrong #2). The
windowed test is additionally anchored directly to a DuckDB replay of the
same aggregation."""

from tests.conftest import SF_SMOKE


def _windowed_from_duckdb(events_path):
    """DuckDB oracle for windowed_counts: (window_start str, type) -> (n, total)."""
    import duckdb

    rows = duckdb.sql(
        f"""
        SELECT STRFTIME(TIME_BUCKET(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS w,
               event_type,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS tv
        FROM read_parquet('{events_path}')
        GROUP BY 1, 2
        """
    ).fetchall()
    return {(w, et): (n, tv) for w, et, n, tv in rows}


def test_stream_matches_batch_and_duckdb(spark):
    from duckdb_ner_spark.streaming.events import (
        batch_events,
        run_stream_to_memory,
        windowed_counts,
    )

    run_stream_to_memory(spark, SF_SMOKE, table_name="t_stream_out")
    got = {
        (r.window_start.strftime("%Y-%m-%d %H:%M:%S"), r.event_type): (r.n, r.total_value)
        for r in spark.table("t_stream_out").collect()
    }
    # batch_events delegates to the catalog — the independent, oracle-gated path
    expect = {
        (r.window_start.strftime("%Y-%m-%d %H:%M:%S"), r.event_type): (r.n, r.total_value)
        for r in windowed_counts(batch_events(spark, SF_SMOKE)).collect()
    }
    assert got == expect
    assert len(expect) > 0
    # direct DuckDB anchor: catches a bug shared by BOTH Spark read paths
    assert got == _windowed_from_duckdb(f"{SF_SMOKE}/events.parquet")


def test_stream_layout_adaptive_both_ts_layouts(spark, tmp_path):
    """The same events rewritten as timestamp[us] AND as INT64 TIMESTAMP(NANOS)
    must produce identical windows through the STREAM path, each equal to its
    own DuckDB replay (the round-2 defect: the nanos layout was hardcoded, so
    the µs layout compressed 1000× into 1970)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_ner_spark.streaming.events import (
        stream_events,
        windowed_counts,
        _await_drain,
    )

    src = pq.read_table(f"{SF_SMOKE}/events.parquet")
    i = src.schema.get_field_index("ts")
    layouts = {
        "us": src.set_column(i, "ts", src.column("ts").cast(pa.timestamp("us"))),
        "ns": src.set_column(i, "ts", src.column("ts").cast(pa.timestamp("ns"))),
    }
    results = {}
    for tag, tbl in layouts.items():
        d = tmp_path / tag
        d.mkdir()
        pq.write_table(tbl, str(d / "events.parquet"), version="2.6")
        sink = f"t_layout_{tag}"
        q = (
            windowed_counts(stream_events(spark, str(d)))
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _await_drain(q)
        results[tag] = {
            (r.window_start.strftime("%Y-%m-%d %H:%M:%S"), r.event_type): (r.n, r.total_value)
            for r in spark.table(sink).collect()
        }
        assert results[tag] == _windowed_from_duckdb(str(d / "events.parquet")), tag
    assert results["us"] == results["ns"]
    assert len(results["us"]) > 0


def test_catalog_rejects_layout_drift(spark, tmp_path):
    """A third, unknown events layout (string ts / missing columns) must fail
    loudly at catalog load with a descriptive error — not produce garbage."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from duckdb_ner_spark.sources.catalog import Catalog, DataLayoutError

    bad_ts = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(["2026-01-01"], pa.string()),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["a"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    d1 = tmp_path / "badts"
    d1.mkdir()
    pq.write_table(bad_ts, str(d1 / "events.parquet"))
    with pytest.raises(DataLayoutError, match="events.ts physical type"):
        Catalog(spark, str(d1)).table("events")

    missing_col = bad_ts.drop_columns(["props"])
    d2 = tmp_path / "missing"
    d2.mkdir()
    pq.write_table(missing_col, str(d2 / "events.parquet"))
    with pytest.raises(DataLayoutError, match="field-set drift"):
        Catalog(spark, str(d2)).table("events")


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

    # horizon must cover the dataset's full time span: the staged stream now
    # runs REAL multi-batch drains with an advancing watermark, and
    # dropDuplicatesWithinWatermark only equals a global DISTINCT when no
    # duplicate pair is farther apart than the horizon (the production
    # trade-off the operator exists to make)
    q = (
        dedup_stream(stream_events(spark, SF_SMOKE), ["user_id", "event_type"], watermark="40 days")
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


def test_staged_stream_runs_multiple_batches(spark):
    """The staged drain must exercise REAL multi-batch streaming (state and
    watermark across batches), not collapse into one micro-batch."""
    from duckdb_ner_spark.streaming.events import (
        N_STREAM_PARTS,
        stream_events,
        windowed_counts,
        _await_drain,
    )

    q = (
        windowed_counts(stream_events(spark, SF_SMOKE))
        .writeStream.format("memory")
        .queryName("t_multibatch")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await_drain(q)
    data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(data_batches) == N_STREAM_PARTS, [p["numInputRows"] for p in q.recentProgress]


def test_events_time_ordered_staging_invariant():
    """Row-range slicing of the source preserves event-time order across
    micro-batches ONLY because the testdata events are globally time-ordered
    — assert that invariant so a reordered regeneration fails loudly here
    rather than via silently dropped late rows."""
    import pyarrow.parquet as pq

    ts = pq.read_table(f"{SF_SMOKE}/events.parquet", columns=["ts"]).to_pandas()["ts"]
    assert ts.is_monotonic_increasing


def test_stream_session_closed_sessions_match_gaps_and_islands(spark):
    """Append-mode session windows: drained sink == gaps-and-islands replay
    restricted to sessions closed before the final watermark."""
    import duckdb

    from duckdb_ner_spark.operators.streaming_queries import q_stream_session

    got = {
        (r.user_id, r.session_start): r.n_events
        for r in q_stream_session(spark, SF_SMOKE).collect()
    }
    rows = duckdb.sql(
        f"""
        WITH e AS (SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')),
        d AS (SELECT user_id, ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM e),
        i AS (SELECT user_id, ts,
                     SUM(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM d),
        s AS (SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS lt, COUNT(*) AS n
              FROM i GROUP BY user_id, sid),
        mx AS (SELECT MAX(ts) AS m FROM e)
        SELECT user_id, STRFTIME(st, '%Y-%m-%d %H:%M:%S') AS st, n
        FROM s, mx WHERE s.lt + INTERVAL 30 MINUTE <= mx.m - INTERVAL 1 SECOND
        """
    ).fetchall()
    expect = {(u, st): n for u, st, n in rows}
    assert got == expect
    assert len(got) > 0


def test_catalog_batch_reads_both_ts_layouts(spark, tmp_path):
    """The BATCH catalog must read both events ts layouts to identical
    values (the streaming twin of this test covers the stream path; the
    nanos branch would otherwise be untested now that the shipped testdata
    is timestamp[us])."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_ner_spark.sources.catalog import Catalog

    src = pq.read_table(f"{SF_SMOKE}/events.parquet")
    i = src.schema.get_field_index("ts")
    results = {}
    for tag, typ in [("us", pa.timestamp("us")), ("ns", pa.timestamp("ns"))]:
        d = tmp_path / f"cat_{tag}"
        d.mkdir()
        pq.write_table(
            src.set_column(i, "ts", src.column("ts").cast(typ)),
            str(d / "events.parquet"),
            version="2.6",
        )
        ev = Catalog(spark, str(d)).table("events")
        results[tag] = sorted(
            (r.event_id, r.ts.strftime("%Y-%m-%d %H:%M:%S.%f")) for r in ev.collect()
        )
    assert results["us"] == results["ns"]
    assert len(results["us"]) > 0


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Checkpoint resume semantics: a drain sees files 0-1, then files 2-3
    arrive and a SECOND drain with the SAME checkpoint must process only the
    new files — no reprocessing, no loss (exactly-once with the idempotent
    per-batch sink)."""
    import shutil

    import pyarrow.parquet as pq

    from duckdb_ner_spark.streaming.events import _await_drain

    src = pq.read_table(f"{SF_SMOKE}/events.parquet")
    per = (src.num_rows + 3) // 4
    land = tmp_path / "landing"
    land.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def write_part(i):
        pq.write_table(src.slice(i * per, per), str(land / f"part-{i}.parquet"))

    def drain():
        sch = spark.read.parquet(str(land)).schema

        def handle(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")

        q = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(land))
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await_drain(q)

    write_part(0)
    write_part(1)
    drain()
    n_first = spark.read.parquet(out).count()
    assert n_first == min(2 * per, src.num_rows)

    write_part(2)
    write_part(3)
    drain()
    final = spark.read.parquet(out)
    assert final.count() == src.num_rows  # no loss, no duplication
    assert final.select("event_id").distinct().count() == src.num_rows
    # resume ran as new batches (ids beyond the first run's), not a rescan
    import os

    batch_dirs = sorted(d for d in os.listdir(out) if d.startswith("batch_id="))
    assert len(batch_dirs) >= 3


def test_session_boundary_emits_at_exact_watermark_equality(spark, tmp_path):
    """Pin the eviction boundary the q_stream_session oracle depends on:
    a session whose end (last event + gap) EQUALS the final watermark
    (max ts − delay) is EMITTED — i.e. the closed-set predicate is <=,
    not <. Synthetic data hits the boundary to the microsecond."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_ner_spark.streaming.events import (
        _await_drain,
        session_counts,
        stream_events,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 1), (2, t0 + dt.timedelta(minutes=30, seconds=1), 2)]
    tbl = pa.table(
        {
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["click", "click"]),
            "value": pa.array([1.0, 1.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    d = tmp_path / "bnd"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    q = (
        session_counts(stream_events(spark, str(d)))
        .writeStream.format("memory")
        .queryName("t_bnd")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_drain(q)
    emitted = {r.user_id for r in spark.table("t_bnd").collect()}
    assert 1 in emitted  # end == watermark -> emitted (<= semantics)
    assert 2 not in emitted  # still open at end of data


def test_events_per_user_ts_uniqueness_invariant():
    """The streaming-session oracle (gaps-and-islands replay) and q_scd2's
    pre-r4 window order were deterministic ONLY because (user_id, ts) is
    unique in the generated testdata. q_scd2 now pins ties via event_id,
    but the session oracle still relies on uniqueness — assert it so a
    regenerated corpus with per-user duplicate timestamps fails loudly here
    instead of silently diverging engine-vs-oracle (ADVICE r3)."""
    import duckdb

    n = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM (SELECT user_id, ts FROM '{SF_SMOKE}/events.parquet' "
        "GROUP BY user_id, ts HAVING COUNT(*) > 1)"
    ).fetchone()[0]
    assert n == 0


def test_stream_attribution_matches_batch(spark):
    """Streaming unbounded-lookback attribution == the batch q_attribution
    twin: same attributed purchases, same view timestamps, same gaps — the
    4-micro-batch staged drain must carry per-user view state ACROSS
    batches (a purchase in batch 3 attributed to a view from batch 1)."""
    from tests.conftest import SF_SMOKE

    import __spark_entry__ as e

    stream = {
        r.event_id: (r.view_us, r.gap_us)
        for r in e.queries()["q_stream_attribution"](spark, SF_SMOKE).collect()
    }
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    batch = {}
    for r in e.queries()["q_attribution"](spark, SF_SMOKE).collect():
        vus = round((r.view_ts - epoch).total_seconds() * 1_000_000)
        batch[r.event_id] = (vus, r.gap_us)
    assert stream == batch
