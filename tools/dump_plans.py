"""Dump `.explain("formatted")` for named declared queries (judge evidence).

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query, planned at
$SPARK_GRAFT_SF_DIR (default sf0.1) under the bench steady configuration
(the same confs bench.py pins for the steady pass), matching the r13
convention for plans/r*/ dumps.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from duckdb_ner_spark.session import default_parallelism, get_spark

    cpus = default_parallelism()
    spark = get_spark(
        "dump_plans",
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.sql.shuffle.partitions": "8",
            "spark.duckdb_ner.scanRepartition": str(min(cpus, 8)),
            "spark.locality.wait": "0ms",
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "64m",
        },
    )
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
