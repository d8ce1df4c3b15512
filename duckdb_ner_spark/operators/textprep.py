"""Shared text-preparation expressions for the Tier D pipeline operators.

All pure built-in (JVM-side, codegen'd) expressions — no Python in the hot
path. Cross-engine determinism rule: any hash that must match the DuckDB
oracle is md5-of-string (identical hex in both engines); engine-local hashes
(xxhash64) are used only in rows-only operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def words_col(text: str = "text") -> F.Column:
    """Documents are single-space separated; split to a words array."""
    return F.split(F.col(text), " ")


def shingles_expr(words: str = "ws", n: int = 3) -> F.Column:
    """Distinct n-word shingles. Guarded: < n words → empty array (Spark's
    sequence() would otherwise generate a DESCENDING range — footgun)."""
    parts = ", ".join(f"{words}[i+{k}]" for k in range(n))
    return F.when(
        F.size(F.col(words)) >= n,
        F.expr(f"array_distinct(transform(sequence(0, size({words})-{n}), i -> concat_ws(' ', {parts})))"),
    ).otherwise(F.array().cast("array<string>"))


def seeded_md5(seed: int, col: F.Column) -> F.Column:
    """Engine-portable seeded hash: md5('s<k>|' || value). The lexicographic
    MIN of these hex strings is a valid min-hash (uniform under md5)."""
    return F.md5(F.concat(F.lit(f"s{seed}|"), col))


SQL_SHINGLES = (
    "CASE WHEN len(ws) >= {n} THEN "
    "list_distinct([{concat} FOR i IN range(1, len(ws) - {n_minus_2})]) "
    "ELSE [] END"
)


def sql_shingles(n: int = 3) -> str:
    """DuckDB twin of shingles_expr (1-based list indexing)."""
    concat = " || ' ' || ".join(f"ws[i+{k}]" for k in range(n))
    return SQL_SHINGLES.format(n=n, concat=concat, n_minus_2=n - 2)
