"""Declared-query registry: the parity corpus contract.

Every operator this engine claims is declared here twice: a Spark DataFrame
builder (``QUERIES[name]``) and, where ANSI-SQL-expressible, a DuckDB oracle
string (``ORACLES[name]``). The driver hash-compares the two at sf0.01
(SURVEY.md §5.2). Column names/aliases MUST match pairwise — the comparison
sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def declared(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` ⇒ rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate declared query {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
