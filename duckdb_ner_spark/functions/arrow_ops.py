"""mapInArrow operators — the zero-copy Arrow-native batch path (one level
below pandas UDFs: no pandas conversion, pyarrow compute kernels directly on
the Arrow RecordBatch the executor ships).

Use when the transformation is expressible in pyarrow compute: the batch
never materializes as Python objects, so throughput approaches JVM built-ins
while staying in Python. The natural home for binary/byte-level work.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame


def arrow_byte_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) → (id, n_bytes, n_chars, upper) computed with pyarrow
    kernels on the raw Arrow batches."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            text = batch.column(batch.schema.get_field_index(text_col))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index(id_col)),
                    pc.binary_length(pc.cast(text, pa.binary())).cast(pa.int64()),
                    pc.utf8_length(text).cast(pa.int64()),
                    pc.utf8_upper(text),
                ],
                names=[id_col, "n_bytes", "n_chars", "upper"],
            )

    return df.select(id_col, text_col).mapInArrow(
        run, schema=f"{id_col} long, n_bytes long, n_chars long, upper string"
    )
