"""Custom Python DataSource (Spark 4 DataSource API) — the engine's
"bring your own source" surface, the Spark-native analogue of a DuckDB table
function (e.g. range()/read_csv_auto that the host engine provides).

``SyntheticDataSource``: a deterministic, partitioned generator of
(id, val, cat) rows — formulaic, so a DuckDB oracle can replay it exactly
from range(). Demonstrates the full contract: schema declaration, partition
planning (parallel reads), per-partition iteration.

Scale notes: partitions() drives read parallelism — each partition generates
its slice independently on an executor (no driver data path), exactly how a
production source shards row-ranges/files/offsets.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 8))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        return [
            _RangePartition(s, min(s + step, self.n_rows))
            for s in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, (i * i) % 97, f"cat_{i % 5}")


class SyntheticDataSource(DataSource):
    """spark.read.format("synthetic").option("n_rows", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic"

    def schema(self) -> str:
        return "id BIGINT, val BIGINT, cat STRING"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticDataSource)


# --------------------------------------------------------------------------
# Streaming Python DataSource (Spark 4 SimpleDataSourceStreamReader)
# --------------------------------------------------------------------------


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming reader over the same deterministic formula
    as the batch source: offsets are row indices, each micro-batch emits at
    most `chunk` rows until `n_rows` is exhausted, then reports no growth
    (so processAllAvailable() terminates). The offset dict is the engine-
    checkpointed cursor — restart-safe by construction because the formula
    is a pure function of the row index."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.chunk = int(options.get("chunk", 250))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = int(start["pos"])
        end = min(pos + self.chunk, self.n_rows)
        # a LIST ITERATOR, not a generator: the engine's prefetch cache
        # both next()s and copy.copy()s what read() returns — list
        # iterators support both, generators cannot be copied
        rows = [(i, (i * i) % 97, f"cat_{i % 5}") for i in range(pos, end)]
        return (iter(rows), {"pos": end})

    def readBetweenOffsets(self, start, end):
        # replay for recovery: same pure formula, any offset range
        return iter(
            [
                (i, (i * i) % 97, f"cat_{i % 5}")
                for i in range(int(start["pos"]), int(end["pos"]))
            ]
        )

    def commit(self, end):
        pass


class SyntheticStreamDataSource(DataSource):
    """spark.readStream.format("synthetic_stream").option("n_rows", N)
    .option("chunk", C).load() — C-row micro-batches of the deterministic
    (id, val, cat) generator."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_stream"

    def schema(self) -> str:
        return "id BIGINT, val BIGINT, cat STRING"

    def simpleStreamReader(self, schema: StructType):
        return SyntheticStreamReader(self.options)


def register_synthetic_stream_source(spark) -> None:
    spark.dataSource.register(SyntheticStreamDataSource)


# --------------------------------------------------------------------------
# Custom SINK: Python DataSource WRITE path (Spark 4 DataSourceWriter)
# --------------------------------------------------------------------------


class _KVCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class KVTextWriter(DataSourceWriter):
    """Executor-side writer with the real two-phase commit contract: each
    task writes its own uniquely-named data file and returns a commit
    message; only files named in the driver-side ``_committed`` manifest
    are part of the dataset, so files from failed/speculative task
    attempts are invisible to readers — the exactly-once story every
    production sink (parquet _SUCCESS+file-listing, Iceberg/Delta
    manifests) implements, demonstrated through the Python DataSource
    API."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import os
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}-{uuid.uuid4().hex}.kv"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write("\t".join("" if v is None else str(v) for v in row) + "\n")
                n += 1
        return _KVCommit(name, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "files": sorted(m.filename for m in messages),
            "rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_committed"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class _KVFilePartition(InputPartition):
    def __init__(self, filepath: str):
        self.filepath = filepath


class KVTextReader(DataSourceReader):
    """Reads ONLY the files named by the commit manifest (one partition
    per committed file — scan parallelism = task commit count)."""

    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        import json
        import os

        with open(os.path.join(self.path, "_committed")) as f:
            manifest = json.load(f)
        return [
            _KVFilePartition(os.path.join(self.path, name))
            for name in manifest["files"]
        ]

    def read(self, partition: _KVFilePartition):
        with open(partition.filepath) as f:
            for line in f:
                doc_id, lang, n_chars = line.rstrip("\n").split("\t")
                yield (int(doc_id), lang, int(n_chars))


class KVTextDataSource(DataSource):
    """``df.write.format("kvtext").option("path", p).mode("append").save()``
    then ``spark.read.format("kvtext").option("path", p).load()`` — a
    complete custom Python connector: executor-parallel manifest-committed
    writes, manifest-driven parallel reads. Fixed demo schema
    (doc_id BIGINT, lang STRING, n_chars BIGINT)."""

    @classmethod
    def name(cls) -> str:
        return "kvtext"

    def schema(self) -> str:
        return "doc_id BIGINT, lang STRING, n_chars BIGINT"

    def reader(self, schema: StructType) -> DataSourceReader:
        return KVTextReader(self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return KVTextWriter(self.options)


def register_kvtext_source(spark) -> None:
    spark.dataSource.register(KVTextDataSource)
