"""Grouped pandas APIs: applyInPandas (grouped map) and pandas_udf
GROUPED_AGG (custom aggregate) — the remaining Python-boundary surfaces
beyond scalar pandas UDFs / mapInPandas / mapInArrow / state.

Both declared queries below are HASH-verified against DuckDB, which for
Python-computed floats requires engineered exactness: the pandas side does
its arithmetic in decimal.Decimal over the 2-decimal source values, so the
moments match DuckDB's DECIMAL aggregation bit-for-bit after the final
cast-to-double (same discipline as operators/relational.py).
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.registry import declared
from ..sources.catalog import load_tables

ZSCORE_SCHEMA = "user_id bigint, event_id bigint, value double, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # decimal-exact moments over the 2-decimal values → double at the end
    vals = [Decimal(f"{v:.2f}") for v in pdf["value"]]
    n = len(vals)
    mean = float(sum(vals)) / n
    if n > 1:
        s2 = float(sum(v * v for v in vals))
        s1 = float(sum(vals))
        var = (s2 * n - s1 * s1) / (n * n * (n - 1) / n)  # == (s2*n - s1^2)/(n*(n-1))
        sd = var**0.5
    else:
        sd = 0.0
    z = [(float(v) - mean) / sd if sd > 0 else None for v in vals]
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "zscore": z,
        }
    )


def zscore_per_user(events: DataFrame) -> DataFrame:
    """Grouped-map applyInPandas: per-user z-score normalization (the
    classic per-entity feature-normalization step of a training pipeline)."""
    return events.select("user_id", "event_id", "value").groupBy("user_id").applyInPandas(
        _zscore_group, schema=ZSCORE_SCHEMA
    )


@declared(
    "q_grouped_map",
    oracle="""
    WITH stats AS (
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
                    AS DOUBLE) AS s2
        FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id, e.value,
           CASE WHEN s.n > 1
                 AND (s.s2 * s.n - s.s1 * s.s1) / (CAST(s.n AS DOUBLE) * (s.n - 1)) > 0
                THEN (e.value - s.s1 / s.n)
                     / SQRT((s.s2 * s.n - s.s1 * s.s1) / (CAST(s.n AS DOUBLE) * (s.n - 1)))
                ELSE NULL END AS zscore
    FROM events e JOIN stats s ON e.user_id = s.user_id
    """,
)
def q_grouped_map(spark, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return zscore_per_user(t.events)


@declared(
    "q_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(l_orderkey * l_linenumber) AS BIGINT) % 1000000007 AS weighted_checksum
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_grouped_agg_udaf(spark, sf_dir: str) -> DataFrame:
    """Custom aggregate as a GROUPED_AGG pandas UDF (exact int math in
    Python — oracle-identical by construction)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def weighted_checksum(orderkey: pd.Series, linenumber: pd.Series) -> int:
        return int((orderkey.astype(object) * linenumber.astype(object)).sum()) % 1000000007

    t = load_tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        weighted_checksum("l_orderkey", "l_linenumber").alias("weighted_checksum")
    )
