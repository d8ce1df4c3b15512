"""Decompose bench per-query time: DataFrame construction vs execution.

For each headline query, measures
- build: Python-side DataFrame construction (Py4J round trips + analysis)
- exec:  .count() on the already-built DataFrame (optimize + schedule + run)
both best-of-3 after one warmup, on the same warmed/cached session bench.py
uses. Prints a table plus totals so conf experiments have a feedback loop.

Usage: python tools/bench_profile.py [--conf k=v ...] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    extra: dict[str, str] = {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    }
    only: list[str] = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--conf":
            k, _, v = args[i + 1].partition("=")
            extra[k] = v
            i += 2
        else:
            only.append(args[i])
            i += 1

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from duckdb_ner_spark.session import default_parallelism, get_spark
    from duckdb_ner_spark.sources.catalog import TABLES, load_tables

    cpus = default_parallelism()
    extra.setdefault("spark.duckdb_ner.scanRepartition", str(cpus))
    spark = get_spark("bench-profile", extra_conf=extra)
    for k, v in extra.items():
        try:
            spark.conf.set(k, v)  # session may be reused; force runtime confs
        except Exception:
            pass

    qs = entrymod.queries()
    cat = load_tables(spark, sf_dir)
    for t in TABLES:
        cat.table(t).cache().count()

    names = only or HEADLINE
    rows = []
    for name in names:
        # warmup (codegen JIT)
        qs[name](spark, sf_dir).count()
        build = exec_ = float("inf")
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            build = min(build, t1 - t0)
            exec_ = min(exec_, t2 - t1)
        rows.append((name, build, exec_))

    print(f"{'query':<18} {'build':>7} {'exec':>7} {'total':>7}")
    tb = te = 0.0
    for name, b, e in rows:
        print(f"{name:<18} {b:>7.3f} {e:>7.3f} {b + e:>7.3f}")
        tb += b
        te += e
    print(f"{'TOTAL':<18} {tb:>7.3f} {te:>7.3f} {tb + te:>7.3f}")


if __name__ == "__main__":
    main()
