"""Bounded-state hot-bucket cap shared by every (band, sig) bucket self-join
in the repo — MinHash-LSH dedup, image aHash dedup, hyperplane-LSH ANN and
embedding near-dup (VERDICT r6 #2, ADVICE r6 #1). Lives in its own module so
dedup.py, multimodal.py, and similarity.py can all import it without cycles
(dedup already imports from similarity)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Salt fan-out for the two-level min-k cap below. 64 salts bound the largest
# single aggregation buffer at max(|bucket|/64, 64·cap) elements — a 10⁶-doc
# degenerate bucket peaks at ~16k ids (~128 KB) per buffer instead of the
# whole 10⁶-element array the one-level collect_list form materialized.
N_CAP_SALTS = 64


def capped_bucket_ids(
    bands: DataFrame, id_col: str, cap: int, keys: tuple[str, ...] = ("band", "sig")
) -> DataFrame:
    """Keep each (band, sig) bucket's `cap` smallest ids — BOUNDED-STATE
    (VERDICT r6 #2, replacing the one-level collect_list cap whose final
    buffer held the entire bucket in memory before the sort+slice).

    Two-level salted min-k: level 1 takes the `cap` smallest ids per
    (band, sig, id % N_CAP_SALTS) — each buffer sees only its salt's share
    of the bucket — and level 2 merges the ≤ N_CAP_SALTS·cap survivors and
    takes the `cap` smallest overall. Hash-identical to the one-level form
    by construction: every one of a bucket's `cap` globally-smallest ids is
    among the `cap` smallest of its own salt group, so the level-2 merge
    sees all of them. Ids must be non-negative (Spark % vs DuckDB % agree
    only there — the corpus invariant every id column already satisfies).
    Replayed by sql_capped_bucket_ctes."""
    salt = (F.col(id_col) % N_CAP_SALTS).alias("__salt__")
    lvl1 = bands.groupBy(*keys, salt).agg(
        F.slice(F.array_sort(F.collect_list(id_col)), 1, cap).alias("__ids__")
    )
    return (
        lvl1.groupBy(*keys)
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("__ids__"))), 1, cap
            ).alias("__ids__")
        )
        .select(*keys, F.explode("__ids__").alias(id_col))
    )


def sql_capped_bucket_ctes(
    src: str,
    id_col: str,
    cap: int,
    prefix: str = "capped",
    keys: tuple[str, ...] = ("band", "sig"),
) -> str:
    """DuckDB twin of capped_bucket_ids: a {prefix}1/{prefix} CTE pair over
    a preceding CTE ``src(*keys, id_col)`` — same salt (id % N_CAP_SALTS),
    same per-salt min-k, same merged min-k. `prefix` keeps the CTE names
    distinct when one query embeds the helper twice (ADVICE r7 #3); the
    defaults preserve every existing oracle string. `keys` generalizes the
    bucket key beyond (band, sig) — q_basket_affinity caps per-basket
    fan-out with keys=('o',)."""
    ks = ", ".join(keys)
    return f"""{prefix}1 AS (
        SELECT {ks},
               list_slice(list_sort(list({id_col})), 1, {cap}) AS ids
        FROM {src} GROUP BY {ks}, {id_col} % {N_CAP_SALTS}
    ), {prefix} AS (
        SELECT {ks},
               unnest(list_slice(list_sort(flatten(list(ids))), 1, {cap}))
                   AS {id_col}
        FROM {prefix}1 GROUP BY {ks}
    )"""
