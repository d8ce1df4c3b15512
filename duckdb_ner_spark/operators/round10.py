"""Round-10 operators: substring-span REMOVAL dedup — the production half
of the q_memorization audit (VERDICT r9 Next-round #2).

q_memorization (round7c.py) SCORES repeated long-substring mass; this
module EMITS the transform: per-document excised-span inventories for
every >= SSD_K-char span that occurs more than once in the corpus, with
the keep-first canonical occurrence retained (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — the
ExactSubstr dedup their suffix-array pipeline applies before training).

Beyond-reference surface (SURVEY.md §2.D, dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import declared
from ..sources.catalog import load_tables

SSD_K = 40  # minimum verbatim span length (chars) — q_memorization's K
# Packs (doc_id, position) into ONE BIGINT so keep-first is a plain MIN
# (engine-exact in both Spark and DuckDB; no struct/arg_min portability
# hazard). Invariant: every document has n_chars < SSD_POS_BIG (synthetic
# corpus max is 577; a production corpus raises the constant or switches
# to a 128-bit pack).
SSD_POS_BIG = 100_000

_SUBSTRING_DEDUP_ORACLE = f"""
    WITH pos AS (
        SELECT doc_id, text, n_chars,
               unnest(range(1, (n_chars - {SSD_K} + 2)::BIGINT)) AS i
        FROM documents WHERE n_chars >= {SSD_K}
    ), sh AS (
        SELECT doc_id, i,
               substr(md5(substr(text, i::INT, {SSD_K})), 1, 16) AS h
        FROM pos
    ), g AS (
        SELECT h, COUNT(*) AS n_occ,
               MIN(doc_id * {SSD_POS_BIG} + i) AS first_key
        FROM sh GROUP BY h
    ), excise AS (
        SELECT s.doc_id, s.i AS st, s.i + {SSD_K} - 1 AS en
        FROM sh s JOIN g ON g.h = s.h
        WHERE g.n_occ > 1 AND s.doc_id * {SSD_POS_BIG} + s.i <> g.first_key
    ), isl AS (
        SELECT doc_id, st, en,
               CASE WHEN st > COALESCE(MAX(en) OVER (
                        PARTITION BY doc_id ORDER BY st, en
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1) + 1
                    THEN 1 ELSE 0 END AS new_isl
        FROM excise
    ), isl2 AS (
        SELECT doc_id, st, en,
               SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY st, en)
                   AS span_seq
        FROM isl
    ), spans AS (
        SELECT doc_id, CAST(span_seq AS BIGINT) AS span_seq,
               CAST(MIN(st) AS BIGINT) AS excise_start,
               CAST(MAX(en) AS BIGINT) AS excise_end,
               CAST(MAX(en) - MIN(st) + 1 AS BIGINT) AS excise_len
        FROM isl2 GROUP BY doc_id, span_seq
    )
    SELECT s.doc_id, s.span_seq, s.excise_start, s.excise_end, s.excise_len,
           CAST(SUM(s.excise_len) OVER (PARTITION BY s.doc_id) AS BIGINT)
               AS doc_chars_removed,
           CAST(d.n_chars - SUM(s.excise_len) OVER (PARTITION BY s.doc_id)
               AS BIGINT) AS doc_chars_kept
    FROM spans s JOIN documents d USING (doc_id)
"""


def substring_excise_spans(docs: DataFrame, k: int = SSD_K) -> DataFrame:
    """Core transform: per-doc maximal excised spans (1-based char offsets,
    inclusive) for every k-char window whose content occurs elsewhere in
    the corpus, keep-first canonical occurrence retained.

    Returns (doc_id, span_seq, excise_start, excise_end, excise_len) —
    applying `remove text[excise_start..excise_end] per span` yields the
    ExactSubstr-deduplicated corpus: every duplicated span >= k chars
    survives in exactly its first (min doc_id, then min offset)
    occurrence. The pytest fixture proves removal is lossless elsewhere
    (tests/test_round10_ops.py::test_substring_dedup_lossless).
    """
    big = SSD_POS_BIG
    sh = (
        docs.filter(F.col("n_chars") >= k)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("n_chars") - k + 1)).alias("i"),
            "text",
        )
        .select(
            "doc_id",
            "i",
            F.substring(F.md5(F.expr(f"substr(text, i, {k})")), 1, 16).alias("h"),
        )
    )
    # Per-shingle census: occurrence count + keep-first key. Both are
    # algebraic (map-side combined); no countDistinct expand. min of the
    # packed BIGINT is the lexicographic min over (doc_id, i).
    g = sh.groupBy("h").agg(
        F.count("*").alias("n_occ"),
        F.min(F.col("doc_id") * big + F.col("i")).alias("first_key"),
    )
    # Enrich join back on h: the census is the per-h table of the SAME
    # position-dense stream — corpus-sized, never broadcastable (the
    # q_memorization r9 lesson: AQE would happily broadcast a 184 MiB
    # census). merge hint rides the partitioning g's aggregate produced.
    excise = (
        sh.join(g.hint("merge"), "h")
        .filter(
            (F.col("n_occ") > 1)
            & (F.col("doc_id") * big + F.col("i") != F.col("first_key"))
        )
        .select("doc_id", F.col("i").alias("st"), (F.col("i") + k - 1).alias("en"))
    )
    # Interval merge (islands): windows at overlapping/adjacent offsets
    # coalesce into one maximal span. Both windows share ONE doc_id
    # partitioning — a single exchange keyed on doc_id.
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("st", "en")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy("doc_id").orderBy("st", "en")
    isl = excise.select(
        "doc_id",
        "st",
        "en",
        F.when(
            F.col("st") > F.coalesce(F.max("en").over(w_prev), F.lit(-1)) + 1, 1
        )
        .otherwise(0)
        .alias("new_isl"),
    )
    return (
        isl.select(
            "doc_id", "st", "en", F.sum("new_isl").over(w_run).alias("span_seq")
        )
        .groupBy("doc_id", F.col("span_seq").cast("bigint").alias("span_seq"))
        .agg(
            F.min("st").cast("bigint").alias("excise_start"),
            F.max("en").cast("bigint").alias("excise_end"),
            (F.max("en") - F.min("st") + 1).cast("bigint").alias("excise_len"),
        )
    )


@declared("q_substring_dedup", oracle=_SUBSTRING_DEDUP_ORACLE)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-span REMOVAL dedup — the production transform behind the
    q_memorization audit (Lee et al. 2022 ExactSubstr semantics): every
    maximal run of characters covered by >= SSD_K-char windows whose
    content occurs more than once in the corpus is excised, EXCEPT the
    canonical keep-first occurrence (min doc_id, then min offset — the
    packed-BIGINT MIN, same collapse rule as q_dedup_near/q_semdedup).
    Output is the per-document excised-span inventory: span offsets +
    lengths plus the per-doc removed/kept character rollup — exactly what
    a loader needs to emit cleaned text without this job ever shuffling
    text (spans are offsets; the cleaner re-reads its own doc locally).

    Engine-exactness: shingles group on substr(md5(span),1,16) (house md5
    trick); keep-first is MIN over doc_id*SSD_POS_BIG+i (BIGINT pack,
    n_chars < SSD_POS_BIG corpus invariant documented at the constant);
    interval merge is the standard islands window (MAX(en) OVER preceding
    rows), integer-only throughout.

    Scale notes (100 TB): the corpus never shuffles as text — each doc
    explodes to (doc_id, offset, 16-char digest) map-side; the census is
    one combiner aggregate on h (count + min — NO distinct expand); the
    enrich join is merge-hinted on the census's own partitioning (the
    q_memorization r9 AQE-broadcast lesson); both island windows and the
    span aggregate share ONE doc_id exchange; the final n_chars join
    touches only affected docs. Position density costs ~16 bytes of
    digest per input byte — production samples offsets (every j-th
    position still bounds detected spans >= K + j - 1) exactly as the
    q_memorization docstring prescribes; the inventory shape is unchanged.

    Cites reference scope: the reference engine has no dedup surface —
    this is beyond-reference (SURVEY.md §2.D dedup family, north-star
    training-data pipeline)."""
    t = load_tables(spark, sf_dir)
    docs = t.documents
    spans = substring_excise_spans(docs, SSD_K)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id")
    return (
        spans.join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            "doc_id",
            "span_seq",
            "excise_start",
            "excise_end",
            "excise_len",
            F.sum("excise_len").over(w).cast("bigint").alias("doc_chars_removed"),
            (F.col("n_chars") - F.sum("excise_len").over(w))
            .cast("bigint")
            .alias("doc_chars_kept"),
        )
    )
