"""Measure the ExactSubstr census shuffle payload: windowed-hash vs
suffix-rank (VERDICT r10 Next-round #1 done-criterion — "a SCALING.md row
showing the census shuffle no longer carries 16 bytes/char").

Runs both span-inventory algorithms at a given sf_dir in one session with
the Spark UI REST API enabled, snapshots CUMULATIVE shuffle-write bytes
between phases, and reports bytes-per-corpus-character for each:

- hash_census: substring_excise_spans — every character position emits a
  16-hex md5 digest row into the census groupBy (the r10 weak-at-scale
  flag: incompressible digests, ~16 B/char of digest alone before row
  overhead).
- suffix_chain: staged_suffix_rounds to depth 32 + suffix_spans_from_ranks
  — per-round (doc_id, pos, r) BIGINT triples; dense ranks
  dictionary/delta-compress under lz4, and the chain is shared by every
  consumer (spans at any k in [32, 64], q_suffix_rank, LCP analyses).

Usage: python tools/shuffle_probe.py [sf_dir]
Prints one JSON line; paste the table row into docs/SCALING.md.
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, "/root/repo")

UI_PORT = 4123


def _shuffle_bytes(spark) -> tuple[int, int]:
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages"
    data = json.load(urllib.request.urlopen(url))
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in data),
        sum(s.get("shuffleReadBytes", 0) for s in data),
    )


def main() -> None:
    from duckdb_ner_spark.operators.round10 import (
        SSD_K,
        SUFR_SPAN_ROUNDS,
        packed_excise_spans,
        staged_suffix_rounds,
        substring_excise_spans,
        suffix_spans_from_ranks,
    )
    from duckdb_ner_spark.session import get_spark
    from duckdb_ner_spark.sources.catalog import load_tables

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        "shuffle-probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    t = load_tables(spark, sf_dir)
    n_chars = t.documents.selectExpr("sum(n_chars)").collect()[0][0]

    marks = [_shuffle_bytes(spark)[0]]
    counts = []

    def phase(df) -> None:
        counts.append(df.count())
        marks.append(_shuffle_bytes(spark)[0])

    phase(substring_excise_spans(t.documents, SSD_K))  # md5/64 (audit tool)
    phase(substring_excise_spans(t.documents, SSD_K, digest_chars=32))  # safe md5
    phase(packed_excise_spans(t.documents, SSD_K))  # digest-free exact census
    rounds = staged_suffix_rounds(spark, sf_dir, SUFR_SPAN_ROUNDS)
    marks.append(_shuffle_bytes(spark)[0])  # chain staging
    phase(suffix_spans_from_ranks(rounds[-1][0], t.documents, SSD_K))

    assert len(set(counts)) == 1, counts  # all four algorithms agree
    d = [marks[i + 1] - marks[i] for i in range(len(marks) - 1)]
    out = {
        "sf_dir": sf_dir,
        "corpus_chars": int(n_chars),
        "n_spans": int(counts[0]),
        "bytes_per_char": {
            "hash64_census": round(d[0] / n_chars, 2),
            "hash128_census": round(d[1] / n_chars, 2),
            "packed_census": round(d[2] / n_chars, 2),
            "suffix_chain": round(d[3] / n_chars, 2),
            "suffix_census": round(d[4] / n_chars, 2),
        },
        "shuffle_bytes": {
            "hash64_census": d[0],
            "hash128_census": d[1],
            "packed_census": d[2],
            "suffix_chain": d[3],
            "suffix_census": d[4],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
