"""Round-8 operators: BPE tokenizer APPLICATION, behavioral lift-curve
evaluation, and blocked record linkage (entity resolution).

Beyond-reference surface (SURVEY.md §2.D): the reference ships no
relational operators of its own — these extend the LLM-pipeline family the
north-star brief mandates (BASELINE.json:6), each designed Spark-first for
the 100 TB shape and hash-verified against a DuckDB replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import declared
from ..sources.catalog import load_tables

# --------------------------------------------------------------------------
# BPE APPLY: tokenize the corpus under the learned merges
# --------------------------------------------------------------------------


def _bpe_apply_oracle() -> str:
    from .round7 import BPE_MERGES, _bpe_seq_ctes

    return f"""
    WITH {", ".join(_bpe_seq_ctes())}, vm AS (
        SELECT word, CAST(LEN(string_split(seq, ' ')) AS BIGINT) AS n_tok,
               CAST(LEN(word) AS BIGINT) AS n_chars_w
        FROM s{BPE_MERGES}
    ), dw AS (
        SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_chars_w) AS BIGINT) AS char_tokens,
           CAST(SUM(n_tok) AS BIGINT) AS bpe_tokens,
           CAST((10000 * SUM(n_tok)) // SUM(n_chars_w) AS BIGINT)
               AS compression_bp
    FROM dw JOIN vm USING (word)
    GROUP BY source
"""


@declared("q_bpe_apply", oracle=_bpe_apply_oracle())
def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the other half of the BPE loop: q_bpe_merges
    LEARNS the merge table; this query tokenizes the whole corpus under it
    and accounts what the merges bought, per source (token counts before =
    character segmentation / after = learned segmentation, compression in
    basis points). The production shape exactly: a trainer streams counts
    into a word-frequency table, learns merges on the VOCABULARY, and the
    corpus-scale apply is a broadcast word→segmentation lookup — no
    per-document merge scans ever run at 100 TB (corpus work is one
    explode + one broadcast join + one map-side-combined aggregate; every
    merge-round iteration stays vocabulary-sized).

    Engine-exactness: segment counts are integers; compression is one
    floor division of non-negative BIGINTs (Spark div == DuckDB //); the
    learned segmentation itself is the q_bpe_merges replace-chain whose
    greedy-BPE equality is pytest-pinned."""
    from .round7 import bpe_learned_seqs

    t = load_tables(spark, sf_dir)
    seqs, _ = bpe_learned_seqs(t.documents)
    vocab_map = seqs.select(
        "word",
        F.size(F.split("seq", " ")).cast("bigint").alias("n_tok"),
        F.length("word").cast("bigint").alias("n_chars_w"),
    )
    words = t.documents.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    return (
        words.join(F.broadcast(vocab_map), "word")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_chars_w").cast("bigint").alias("char_tokens"),
            F.sum("n_tok").cast("bigint").alias("bpe_tokens"),
            F.expr("CAST((10000 * SUM(n_tok)) div SUM(n_chars_w) AS BIGINT)").alias(
                "compression_bp"
            ),
        )
    )


# --------------------------------------------------------------------------
# Lift curve: behavioral-score deciling against a later outcome
# --------------------------------------------------------------------------

LIFT_MAX_BUCKET = 10
LIFT_SCALE = 10_000

_LIFT_ORACLE = f"""
    WITH f AS (
        SELECT user_id,
               CAST(LEAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-02 00:00:00'
                                   THEN 1 ELSE 0 END), {LIFT_MAX_BUCKET})
                    AS BIGINT) AS bucket,
               CAST(MAX(CASE WHEN event_type = 'purchase'
                              AND ts >= TIMESTAMP '2024-01-02 00:00:00'
                             THEN 1 ELSE 0 END) AS BIGINT) AS converted
        FROM events GROUP BY user_id
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(converted) AS BIGINT) AS pos
        FROM f
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(({LIFT_SCALE} * SUM(converted)) // COUNT(*) AS BIGINT)
               AS rate_bp,
           CAST(({LIFT_SCALE} * SUM(converted) * (SELECT n FROM tot))
                // (COUNT(*) * (SELECT pos FROM tot)) AS BIGINT) AS lift_bp
    FROM f GROUP BY bucket
"""


@declared("q_lift_curve", oracle=_LIFT_ORACLE)
def q_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift/decile curve — the model-evaluation readout between q_auc
    (ranking quality) and q_ab_test (intervention effect): users are
    bucketed by a behavioral score (day-1 activity count, capped at
    {LIFT_MAX_BUCKET}) and each bucket's LATER conversion rate (purchase
    after day 1) is compared to the population rate. lift_bp > 10000 in
    high buckets = the score targets converters; the curve is what a
    campaign-sizing or data-selection decision actually consumes.

    Engine-exactness: one floor division per output cell over exact
    BIGINT counts — rate_bp = 10^4·pos_b // n_b and lift_bp =
    10^4·pos_b·N // (n_b·POS), integer cross-multiplication instead of a
    rate/rate double quotient. Buckets are fixed-width (LEAST cap), NO
    global window.

    Scale notes (100 TB): one map-side-combined per-user aggregate over
    events (the only corpus shuffle), a 1-row population total broadcast
    into a {LIFT_MAX_BUCKET + 1}-row bucket aggregate; the score/outcome
    time split is pure column arithmetic pushed to the scan."""
    t = load_tables(spark, sf_dir)
    day2 = F.expr("TIMESTAMP '2024-01-02 00:00:00'")
    f = t.events.groupBy("user_id").agg(
        F.least(
            F.sum(F.when(F.col("ts") < day2, 1).otherwise(0)),
            F.lit(LIFT_MAX_BUCKET),
        )
        .cast("bigint")
        .alias("bucket"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") >= day2), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("converted"),
    )
    tot = f.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("pos"),
    )
    return (
        f.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_users",
            "n_converted",
            F.expr(f"CAST(({LIFT_SCALE} * n_converted) div n_users AS BIGINT)").alias(
                "rate_bp"
            ),
            F.expr(
                f"CAST(({LIFT_SCALE} * n_converted * n) div (n_users * pos)"
                " AS BIGINT)"
            ).alias("lift_bp"),
        )
    )


# --------------------------------------------------------------------------
# Blocked record linkage (entity resolution)
# --------------------------------------------------------------------------

RL_BLOCK_CAP = 64  # records per block entering the pair join (caps.py idiom)
RL_CLOSE_DIST = 12  # "close pair" threshold on the 5-word part names


def _linkage_oracle() -> str:
    from .caps import sql_capped_bucket_ctes

    return f"""
    WITH recs AS (
        SELECT p_partkey, p_name,
               string_split(p_name, ' ')[1] AS bk
        FROM part
    ), bands AS (
        SELECT 0 AS band, bk AS sig, p_partkey FROM recs
    ), {sql_capped_bucket_ctes("bands", "p_partkey", RL_BLOCK_CAP)}, kept AS (
        SELECT c.sig AS bk, c.p_partkey, r.p_name
        FROM capped c JOIN recs r USING (p_partkey)
    ), pairs AS (
        SELECT a.bk, levenshtein(a.p_name, b.p_name) AS d
        FROM kept a JOIN kept b
          ON a.bk = b.bk AND a.p_partkey < b.p_partkey
    )
    SELECT k.bk AS block_key,
           CAST(COUNT(DISTINCT k.p_partkey) AS BIGINT) AS n_records,
           CAST((SELECT COUNT(*) FROM pairs p WHERE p.bk = k.bk) AS BIGINT)
               AS n_pairs,
           CAST((SELECT COUNT(*) FROM pairs p
                 WHERE p.bk = k.bk AND p.d <= {RL_CLOSE_DIST}) AS BIGINT)
               AS n_close,
           CAST((SELECT MIN(p.d) FROM pairs p WHERE p.bk = k.bk) AS BIGINT)
               AS min_dist
    FROM kept k GROUP BY k.bk
"""


@declared("q_record_linkage", oracle=_linkage_oracle())
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked record linkage (entity resolution) over part names — the
    dedup family's STRING-SIMILARITY member: q_fuzzy proves the
    edit-distance surface on a 25-row dim; this runs it at table scale
    the only way that scales — BLOCKING. Records block on a cheap key
    (first name word), each block is capped at {RL_BLOCK_CAP} smallest
    keys by the shared bounded-state min-k (caps.py — the LSH hot-bucket
    guard reused verbatim on a 1-band index), and Levenshtein runs ONLY
    on in-block pairs: O(Σ block²) bounded, never O(n²). Output is the
    per-block linkage scorecard (records, pairs checked, close pairs,
    min distance) — the audit that sizes a merge/survivorship pass.

    Engine-exactness: both engines' levenshtein is the classic DP edit
    distance (q_fuzzy pins hash equality); counts/min are integers; the
    block cap is deterministic (smallest keys survive) and replayed by
    the shared SQL fragment.

    Scale notes (100 TB): the blocking key shuffles 3-column digests of
    the record set, never full records; the capped pair join is the
    q_dedup_near bucket shape; a production pass would follow with
    union-find over close pairs (components.py) for cluster collapse."""
    from .caps import capped_bucket_ids

    t = load_tables(spark, sf_dir)
    recs = t.part.select(
        "p_partkey", "p_name", F.split("p_name", " ").getItem(0).alias("bk")
    )
    bands = recs.select(
        F.lit(0).alias("band"), F.col("bk").alias("sig"), "p_partkey"
    )
    kept = (
        capped_bucket_ids(bands, "p_partkey", RL_BLOCK_CAP)
        .select(F.col("sig").alias("bk"), "p_partkey")
        .join(recs.select("p_partkey", "p_name"), "p_partkey")
    )
    a = kept.select(
        "bk", F.col("p_partkey").alias("ka"), F.col("p_name").alias("na")
    )
    b = kept.select(
        "bk", F.col("p_partkey").alias("kb"), F.col("p_name").alias("nb")
    )
    pairs = (
        a.join(b, "bk")
        .filter(F.col("ka") < F.col("kb"))
        .select("bk", F.levenshtein("na", "nb").cast("bigint").alias("d"))
    )
    pair_stats = pairs.groupBy("bk").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("d") <= RL_CLOSE_DIST, 1).otherwise(0))
        .cast("bigint")
        .alias("n_close"),
        F.min("d").cast("bigint").alias("min_dist"),
    )
    return (
        kept.groupBy(F.col("bk").alias("block_key"))
        .agg(F.countDistinct("p_partkey").cast("bigint").alias("n_records"))
        .join(
            pair_stats.withColumnRenamed("bk", "block_key"), "block_key", "left"
        )
        .select(
            "block_key",
            "n_records",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_close", F.lit(0)).cast("bigint").alias("n_close"),
            F.col("min_dist").cast("bigint").alias("min_dist"),
        )
    )
