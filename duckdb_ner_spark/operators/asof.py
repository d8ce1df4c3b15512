"""As-of join operator (SURVEY.md C10).

Spark has no native ASOF JOIN. The classic scalable formulation is the
union+window technique:

1. tag left rows (needles) and right rows (quotes), union them on a common
   (key, ts) spine;
2. one window per key ordered by (ts, tag) carries the last seen right-side
   value forward (``last(..., ignorenulls=True)``);
3. keep only left rows — each now annotated with the most recent right row at
   or before its timestamp (direction='backward').

Cost: a single shuffle on the join key and one sort within partitions —
O((|L|+|R|) log) per key, versus the O(|L|·|R|) blowup of the naive range
join. At 100 TB this is the only formulation that survives: it inherits AQE
skew splitting on the key and never materializes candidate pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_side__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Return ``left`` with the right-side payload of the closest prior
    (direction='backward') or next (direction='forward') row per key.

    ``right``'s non-key columns (including ``right_ts``) become nullable
    payload columns on the result. ``tolerance`` (an INTERVAL literal like
    ``'3600 seconds'``) optionally bounds the match distance.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    payload_cols = [c for c in right.columns if c not in keys]
    if not payload_cols:
        raise ValueError("right side has no payload columns")
    clash = sorted(set(payload_cols) & set(left.columns))
    if clash:
        raise ValueError(
            f"right payload columns {clash} collide with left columns; "
            "rename one side (e.g. right_ts must differ from left_ts)"
        )

    l_tagged = left.withColumn(_TAG, F.lit(1))
    for c in payload_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.withColumn(_TAG, F.lit(0))
    for c in left.columns:
        if c not in keys and c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    spine_ts = F.coalesce(F.col(left_ts), F.col(right_ts)).alias("__asof_ts__")
    cols = keys + [c for c in left.columns if c not in keys] + payload_cols + [_TAG]
    unioned = l_tagged.select(*cols, spine_ts).unionByName(r_tagged.select(*cols, spine_ts))

    if direction == "backward":
        # right rows sort before left rows at equal ts → "at or before".
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__asof_ts__").asc(), F.col(_TAG).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols]
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__asof_ts__").desc(), F.col(_TAG).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols]

    annotated = unioned.select(
        *keys,
        *[c for c in left.columns if c not in keys],
        F.col(_TAG).alias(_TAG),
        "__asof_ts__",
        *carried,
    )
    out = annotated.filter(F.col(_TAG) == 1).drop(_TAG)

    if tolerance is not None:
        bound = (
            F.col("__asof_ts__") - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("__asof_ts__") + F.expr(f"INTERVAL {tolerance}")
        )
        within = (
            (F.col(right_ts) >= bound) if direction == "backward" else (F.col(right_ts) <= bound)
        )
        out = out.select(
            *keys,
            *[c for c in left.columns if c not in keys],
            *[F.when(within, F.col(c)).otherwise(F.lit(None)).alias(c) for c in payload_cols],
        )
        return out
    return out.drop("__asof_ts__")
