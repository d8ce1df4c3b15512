"""Measure the binary-ANN shortlist shuffle payload: narrow signature
census vs carry-the-vectors (the q_binary_ann design choice).

q_binary_ann ranks Hamming distances in a window partitioned by query.
Two ways to feed that window:

- narrow census (shipped): the census rows are (q_id, vec_id, hamming) —
  the full fixed-point vectors NEVER enter the exchange; shortlisted ids
  are broadcast back to fetch vectors for the re-rank.
- carry-u (the naive first cut): keep the 64xBIGINT unit vector on every
  census row so the re-rank needs no second join — every corpus row drags
  ~512 B of vector through the rank exchange.

Runs both at a given sf_dir in one session (Spark UI REST API),
snapshots cumulative shuffle-write bytes between phases, reports
bytes-per-vector for each. Same top-k ids out of both (asserted).

Usage: python tools/binary_probe.py [sf_dir]
Prints one JSON line; paste the table row into docs/SCALING.md.
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, "/root/repo")

UI_PORT = 4124


def _shuffle_write(spark) -> int:
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages"
    data = json.load(urllib.request.urlopen(url))
    return sum(s.get("shuffleWriteBytes", 0) for s in data)


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from duckdb_ner_spark.operators.round11 import (
        BQ_K,
        BQ_M,
        BQ_NQ,
        binary_signatures,
    )
    from duckdb_ner_spark.session import get_spark
    from duckdb_ner_spark.sources.catalog import load_tables

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        "binary-probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    t = load_tables(spark, sf_dir)
    n_vecs = t.embeddings.count()

    sig = binary_signatures(t.embeddings)
    q = sig.filter(F.col("vec_id") < BQ_NQ).select(
        F.col("vec_id").alias("q_id"),
        F.col("u").alias("qu"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    hamming = (
        F.expr("bit_count(w0 ^ qw0)") + F.expr("bit_count(w1 ^ qw1)")
    ).cast("bigint")
    hw = Window.partitionBy("q_id").orderBy("hamming", "vec_id")
    dot = F.aggregate(
        F.zip_with(F.col("u"), F.col("qu"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )
    rw = Window.partitionBy("q_id").orderBy(F.desc("dot_fx"), "vec_id")

    marks = [_shuffle_write(spark)]
    results = []

    # narrow census (the shipped shape): rank over 3 columns, join back
    narrow_sl = (
        sig.select("vec_id", "w0", "w1")
        .crossJoin(F.broadcast(q.select("q_id", "qw0", "qw1")))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", hamming.alias("hamming"))
        .withColumn("hrank", F.row_number().over(hw))
        .filter(F.col("hrank") <= BQ_M)
        .drop("hrank")
    )
    narrow = (
        sig.select("vec_id", "u")
        .join(F.broadcast(narrow_sl), "vec_id")
        .join(F.broadcast(q.select("q_id", "qu")), "q_id")
        .select("q_id", "vec_id", dot.alias("dot_fx"))
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= BQ_K)
    )
    results.append(
        {(r["q_id"], r["rank"]): r["vec_id"] for r in narrow.collect()}
    )
    marks.append(_shuffle_write(spark))

    # carry-u (naive): vectors ride the census through the rank exchange
    carry = (
        sig.select("vec_id", "u", "w0", "w1")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "u", "qu", hamming.alias("hamming"))
        .withColumn("hrank", F.row_number().over(hw))
        .filter(F.col("hrank") <= BQ_M)
        .select("q_id", "vec_id", dot.alias("dot_fx"))
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= BQ_K)
    )
    results.append(
        {(r["q_id"], r["rank"]): r["vec_id"] for r in carry.collect()}
    )
    marks.append(_shuffle_write(spark))

    assert results[0] == results[1], "shapes disagree on the top-k ids"
    d = [marks[i + 1] - marks[i] for i in range(len(marks) - 1)]
    out = {
        "sf_dir": sf_dir,
        "n_vectors": int(n_vecs),
        "bytes_per_vector": {
            "narrow_census": round(d[0] / n_vecs, 1),
            "carry_u": round(d[1] / n_vecs, 1),
        },
        "shuffle_bytes": {"narrow_census": d[0], "carry_u": d[1]},
        "ratio": round(d[1] / max(d[0], 1), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
