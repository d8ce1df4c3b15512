"""Skew-handling utilities: salting for hot keys (SURVEY.md scale bar).

AQE's skew-join splitting handles most cases at runtime; explicit salting
remains the tool for skewed *aggregations* (AQE does not split a hot groupBy
key) and for deterministic-layout pipelines. Pattern: spray each hot key
across S salt buckets (partial aggregate), then collapse the S partials
(final aggregate). Two small shuffles replace one stuck-on-one-task shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    count_alias: str = "n",
    sum_alias: str = "total",
) -> DataFrame:
    """groupBy(key).agg(count, sum) with a salt stage — result identical to
    the direct aggregation, wall-clock bounded by |hot_key|/n_salts.

    Salt must be deterministic for exact-parity testing → derived from a
    row-stable hash, not rand()."""
    # pmod, not %: Spark % keeps the dividend's sign, which would double the
    # salt-bucket count with negative hashes
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("__salt__")
    partial = (
        df.withColumn("__salt__", salt)
        .groupBy(*key_cols, "__salt__")
        .agg(F.count("*").alias("__n__"), F.sum(value_col).alias("__s__"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__n__").alias(count_alias), F.sum("__s__").alias(sum_alias)
    )
