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
