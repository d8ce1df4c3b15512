"""Round-8 operator tests: the fused streaming ingest pipeline."""

from pyspark.sql import functions as F

from duckdb_ner_spark.plans.registry import QUERIES
from tests.conftest import SF_SMOKE


def test_sliced_documents_stream_runs_real_microbatches(spark):
    """stream_documents_sliced must stage N_DOC_SLICES doc_id-ordered
    slices with ascending mtimes and actually deliver them as SEPARATE
    micro-batches — the property that makes q_stream_pipeline's aggregate
    state genuinely cross-batch."""
    import glob
    import os

    from duckdb_ner_spark.streaming.ner_stream import (
        N_DOC_SLICES,
        stream_documents_sliced,
    )

    stream = stream_documents_sliced(spark, SF_SMOKE)
    import hashlib
    import tempfile

    tag = hashlib.md5(SF_SMOKE.encode()).hexdigest()[:12]
    stage = os.path.join(tempfile.gettempdir(), f"docs_stream_sliced_{tag}")
    parts = sorted(glob.glob(os.path.join(stage, "*.parquet")))
    assert len(parts) == N_DOC_SLICES
    mtimes = [os.stat(p).st_mtime for p in parts]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)

    seen = []

    def per_batch(df, epoch_id):
        seen.append((epoch_id, df.count()))

    q = (
        stream.writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    assert len(seen) == N_DOC_SLICES, f"expected {N_DOC_SLICES} batches: {seen}"
    total = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(n for _, n in seen) == total


def test_stream_pipeline_matches_batch_recompute(spark):
    """The fused stream (dedup probe -> gate -> scorecard across 4
    micro-batches) must equal an independent BATCH recompute of the same
    pipeline inside Spark — the in-engine half of the parity contract
    (the DuckDB oracle pins the cross-engine half)."""
    from duckdb_ner_spark.operators.dedup import N_BANDS, minhash_bands
    from duckdb_ner_spark.operators.textprep import shingles_expr, words_col
    from duckdb_ner_spark.operators.textstats import (
        GATE_DISTINCT_DEN,
        GATE_DISTINCT_NUM,
        GATE_MIN_WORDS,
    )

    got = {
        (r.lang, r.stage): (r.n_docs, r.total_chars, r.id_checksum)
        for r in QUERIES["q_stream_pipeline"](spark, SF_SMOKE).collect()
    }

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    idx = minhash_bands(corpus).select("band", "sig").distinct()
    new_bands = minhash_bands(docs.filter(F.col("doc_id") % 2 == 1))
    dup_ids = {
        r.doc_id
        for r in new_bands.join(idx, ["band", "sig"], "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    }
    feat = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "lang", "n_chars", words_col("text").alias("ws"))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.size("ws").alias("n_words"),
            F.size(F.array_distinct("ws")).alias("n_distinct"),
        )
        .collect()
    )
    expect: dict[tuple, list] = {}
    for r in feat:
        if r.doc_id in dup_ids:
            stage = "dup"
        elif r.n_words < GATE_MIN_WORDS:
            stage = "too_short"
        elif r.n_distinct * GATE_DISTINCT_DEN < GATE_DISTINCT_NUM * r.n_words:
            stage = "repetitive"
        else:
            stage = "keep"
        acc = expect.setdefault((r.lang, stage), [0, 0, 0])
        acc[0] += 1
        acc[1] += r.n_chars
        acc[2] += r.doc_id
    assert got == {k: tuple(v) for k, v in expect.items()}
    # non-vacuity: the pipeline must actually exercise every stage class
    stages = {s for _, s in got}
    assert "keep" in stages and ("dup" in stages or "too_short" in stages)
    assert N_BANDS == 4  # the probe shape the docstring documents
