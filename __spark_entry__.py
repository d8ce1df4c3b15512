"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship TPC-H-Q1-shape query at sf0.001 (smoke).
queries()     — every declared operator from SURVEY.md §2 (Tier C + D).
oracle_sql()  — DuckDB-runnable ANSI SQL twin for each hash-checkable query.

The declared corpus itself lives in duckdb_ner_spark.plans.registry and is
populated by importing the operator modules below.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

import duckdb_ner_spark.operators  # noqa: F401,E402  (registers declared queries)
from duckdb_ner_spark.plans.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_agg_group"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
