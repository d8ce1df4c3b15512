"""Parquet catalog over the driver-generated testdata star schema.

Source layer of the engine: one parquet dataset per table (TESTDATA.md).
Explicit schemas are NOT forced on read — parquet carries them — but each
table's expected schema is documented in FIXTURES.md §1 and asserted by tests.

Scale notes:
- Plain ``spark.read.parquet`` keeps predicate pushdown, column pruning and
  partition pruning intact (verify via ``.explain``: PushedFilters/ReadSchema).
- At 100 TB these would be directory-partitioned (e.g. lineitem by
  ``l_shipdate`` month) and/or bucketed by join key; ``bucket_hint`` documents
  the intended co-location key per table so a cluster deployment can
  ``DISTRIBUTE BY`` / bucket accordingly and turn the big joins shuffle-free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

# table name -> key the 100 TB layout would bucket/partition by
TABLES: dict[str, str | None] = {
    "region": None,  # 5 rows: always broadcast
    "nation": None,  # 25 rows: always broadcast
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# Tables the AUTO scan-parallelism floor applies to: ONLY the compute-per-
# byte-heavy corpora (minhash/tokenize/vector expressions need cores even
# when the bytes are small — serial shingling measured 2-6 s vs 0.6 s
# parallel at sf0.1). Relational tables are exempt: their map-side work is
# scan+filter+partial-agg, cheap even serially at the sizes where the floor
# fires (<32 MB — _estimate_splits yields ≥8 natural splits above that), and
# the AQE-coalesced shuffle gives the reduce side its parallelism anyway.
# Measured on the relational headline subset: floored 7.1 s cold vs exempt
# 4.8 s — the round-robin shuffle + extra AQE stage cost more than the
# parallel map side saved. A floor repartition of a to-be-broadcast
# dimension is pure waste. Explicit scanRepartition=N>0 still applies to
# every keyed table (the steady-state bench path).
_FLOOR_TABLES = {"documents", "embeddings"}


# (session, sf_dir, table, repartition) → resolved DataFrame. A DataFrame is
# an immutable logical plan, so reuse across queries is safe; memoizing skips
# the parquet footer read + schema resolution that `spark.read.parquet` pays
# on every call (~50-150 ms of driver time per table per query — 35% of the
# local bench total was this plan-construction tax). Keyed on the session
# object so a stopped/replaced session never serves stale plans.
_DF_CACHE: dict[tuple, DataFrame] = {}


# (path, mtime, size) → StructType. Metastore-style schema cache: a real
# deployment resolves table schemas from a catalog service instead of
# re-reading parquet footers, so schema inference is paid once per table
# rather than once per (session, table). Keyed on file identity so a
# regenerated testdata file is re-inferred. Saves ~50-150 ms of driver time
# per table per NEW session (the footer listing+inference that
# `spark.read.parquet` performs before planning).
_SCHEMA_CACHE: dict[tuple[str, float, int], "object"] = {}


def _file_key(path: str) -> tuple[str, float, int]:
    import os

    st = os.stat(path)
    return (path, st.st_mtime, st.st_size)


# Layout invariants asserted at load: a silently regenerated testdata file
# whose physical layout drifted must fail LOUDLY here, not produce garbage
# downstream (round-2 lesson: events ts flipped INT64-nanos → timestamp[us]
# and the streaming path quietly put every event in 1970).
_EXPECTED_FIELDS: dict[str, set[str]] = {
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


class DataLayoutError(ValueError):
    """A table's on-disk layout does not match any layout the engine reads."""


def _assert_layout(name: str, df: "DataFrame", path: str) -> None:
    expected = _EXPECTED_FIELDS.get(name)
    if expected is not None and set(df.columns) != expected:
        raise DataLayoutError(
            f"{path}: field-set drift for table {name!r}: "
            f"got {sorted(df.columns)}, expected {sorted(expected)}"
        )
    if name == "events":
        from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

        t = df.schema["ts"].dataType
        if not isinstance(t, (LongType, TimestampType, TimestampNTZType)):
            raise DataLayoutError(
                f"{path}: events.ts physical type {t.simpleString()!r} is not a "
                "layout this engine reads (expected INT64 TIMESTAMP(NANOS) "
                "surfaced as long, or timestamp/timestamp_ntz)"
            )


@dataclass
class Catalog:
    """Lazy handle over one scale-factor directory."""

    spark: SparkSession
    sf_dir: str

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; catalog has {sorted(TABLES)}")
        n_split = int(self.spark.conf.get("spark.duckdb_ner.scanRepartition", "0"))
        key = (self.spark, self.sf_dir, name, n_split)
        cached = _DF_CACHE.get(key)
        if cached is not None:
            return cached
        df = self._build(name, n_split)
        _DF_CACHE[key] = df
        return df

    def _build(self, name: str, n_split: int) -> DataFrame:
        if name == "events":
            # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
            # parquet reader rejects (PARQUET_TYPE_ILLEGAL) unless nanos are
            # surfaced as raw longs. The engine's own session factory
            # (session.py) pins this conf, but the read path must be
            # self-contained for *any* SparkSession (e.g. the driver's vanilla
            # harness session) — DuckDB reads TIMESTAMP_NS natively, so the
            # parity surface can't depend on who built the session. Runtime
            # conf.set is honoured per-read by the parquet source.
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        path = f"{self.sf_dir}/{name}.parquet"
        import os

        if os.path.isfile(path):
            fk = _file_key(path)
            known = _SCHEMA_CACHE.get(fk)
            if known is not None:
                df = self.spark.read.schema(known).parquet(path)
            else:
                df = self.spark.read.parquet(path)
                _SCHEMA_CACHE[fk] = df.schema
        else:
            df = self.spark.read.parquet(path)
        _assert_layout(name, df, path)
        # Scan parallelism floor. The driver-generated testdata is one parquet
        # file with ONE row group per table, so a local scan is a single
        # split — every downstream map stage runs on one core. That is an
        # artifact of the tiny-file layout, not of the plans, and it is bad
        # for ANY user on ANY multi-core machine (a cold near-dedup ran its
        # whole minhash stage serially: 10.8 s of a 29 s first run). Default
        # AUTO mode repartitions a fact table only when its scan yields fewer
        # splits than min(defaultParallelism, 8) — at 100 TB a table is
        # thousands of splits, so auto mode is a no-op there by construction.
        # Aggregation results stay hash-identical: every declared query's
        # float output is decimal-exact or fold-order-pinned (relational.py
        # header), so partitioning cannot shift values.
        #   conf: N>0 = explicit split count; 0/unset = auto; -1 = untouched.
        if TABLES[name] is not None:
            if n_split > 0:
                df = df.repartition(n_split)
            elif n_split == 0 and name in _FLOOR_TABLES:
                target = min(self.spark.sparkContext.defaultParallelism, 8)
                if self._estimate_splits(path) < target:
                    df = df.repartition(target)
        if name == "events":
            # ts is INT64 TIMESTAMP(NANOS): surfaced as long nanos (see
            # session.py nanosAsLong). Truncate ns→µs exactly as DuckDB does
            # when it reads the same file, then expose as a naive timestamp.
            from pyspark.sql import functions as F
            from pyspark.sql.types import LongType

            if isinstance(df.schema["ts"].dataType, LongType):
                # integer division — ns values exceed 2^53, double math drifts
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
                )
        return df

    def _estimate_splits(self, path: str) -> int:
        """Estimate the scan's split count from file size alone — replicating
        Spark's FilePartition sizing (splits of ~max(openCostInBytes≈4MB,
        size/defaultParallelism), capped at maxPartitionBytes) WITHOUT the
        DataFrame→RDD conversion a getNumPartitions() probe forces (~80 ms+
        of driver planning per table, which the cold path pays 10×). An
        estimate is all the parallelism floor needs: it only gates a
        repartition of tiny single-file tables."""
        import math
        import os

        if os.path.isdir(path):
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
                if not f.startswith(("_", "."))
            )
        else:
            size = os.path.getsize(path)
        dp = max(1, self.spark.sparkContext.defaultParallelism)
        open_cost = 4 * 1024 * 1024
        max_part = 128 * 1024 * 1024
        split = min(max_part, max(open_cost, size // dp or 1))
        return max(1, math.ceil(size / split))

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)


def load_tables(spark: SparkSession, sf_dir: str) -> Catalog:
    return Catalog(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view (``spark.sql`` surface parity with
    the reference's SQL-only test harness, /root/reference/test/sql/ner.test)."""
    cat = Catalog(spark, sf_dir)
    for name in TABLES:
        cat.table(name).createOrReplaceTempView(prefix + name)
