"""Round-7 continuation operators, batch d: hashing-trick featurization,
inverted-index posting-list compression, skip-gram pair generation, and
Johnson-Lindenstrauss random projection — the featurization / index-
maintenance / embedding-prep layer of a training-data pipeline (no
reference counterpart; the reference is a 755-LoC NER extension,
src/ner_extension.cpp).

Engine-exactness follows the house rules (operators/relational.py header):
every comparison column is an integer (fixed-point, floor division on
non-negatives) or a deterministic total order; hashes are 60-bit md5
prefixes (Spark conv(hex,16,10) == DuckDB '0x'||hex cast); bit widths via
the integer bit-length trick LENGTH(bin(x)) on positives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import declared
from ..sources.catalog import load_tables

_SPARK_H60 = "CAST(conv(substr(md5({arg}), 1, 15), 16, 10) AS BIGINT)"
_DUCK_H60 = "CAST(('0x' || substr(md5({arg}), 1, 15)) AS BIGINT)"

# --------------------------------------------------------------------------
# Feature hashing (the hashing trick: Weinberger et al. 2009)
# --------------------------------------------------------------------------

FH_D = 256  # hashed feature dimensionality

_FH_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), h AS (
        SELECT doc_id, word,
               {_DUCK_H60.format(arg="'fh|' || word")} % {FH_D} AS idx,
               CASE WHEN ({_DUCK_H60.format(arg="'fh|' || word")} >> 59) & 1 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM w
    ), cell AS (
        SELECT doc_id, idx,
               CAST(SUM(sgn) AS BIGINT) AS v,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words_in_cell
        FROM h GROUP BY doc_id, idx
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS nnz,
           CAST(SUM(ABS(v)) AS BIGINT) AS l1,
           CAST(MAX(ABS(v)) AS BIGINT) AS linf,
           CAST(SUM(n_words_in_cell) - COUNT(*) AS BIGINT) AS collisions,
           CAST(SUM((idx + 1) * v) AS BIGINT) AS vec_checksum
    FROM cell GROUP BY doc_id ORDER BY doc_id
"""


@declared("q_feature_hashing", oracle=_FH_ORACLE)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al. 2009): every word
    occurrence maps to one of FH_D buckets by a 60-bit md5 hash, with a
    sign bit (bit 59 of the same hash) so colliding words cancel in
    expectation instead of piling up. Per document: the sparse vector's
    nnz / L1 / Linf, the number of distinct-word collisions absorbed
    (distinct words landing in an occupied cell), and a position-weighted
    checksum pinning every (index, value) cell exactly — the fixed-width
    featurizer a training pipeline uses when the vocabulary is unbounded
    and a learned tokenizer is too expensive at ingest.

    Engine-exactness: bucket and sign come from the same md5-60 hash
    (non-negative, so % agrees across engines); all outputs are BIGINT
    sums of small integers; doc_id is a total order.

    Scale notes (100 TB): map-only explode feeding two partial-aggregable
    groupBys keyed by (doc_id, idx) then doc_id — both combine map-side,
    no join, state per doc bounded by FH_D regardless of vocabulary, and
    the one shuffle is on doc_id (uniform by construction)."""
    t = load_tables(spark, sf_dir)
    h = (
        t.documents.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .withColumn("hv", F.expr(_SPARK_H60.format(arg="concat('fh|', word)")))
        .select(
            "doc_id",
            "word",
            (F.col("hv") % FH_D).alias("idx"),
            F.expr("CASE WHEN (hv >> 59) & 1 = 0 THEN 1 ELSE -1 END").alias("sgn"),
        )
    )
    cell = h.groupBy("doc_id", "idx").agg(
        F.sum("sgn").cast("bigint").alias("v"),
        F.countDistinct("word").cast("bigint").alias("n_words_in_cell"),
    )
    return (
        cell.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("nnz"),
            F.sum(F.abs("v")).cast("bigint").alias("l1"),
            F.max(F.abs("v")).cast("bigint").alias("linf"),
            (F.sum("n_words_in_cell") - F.count("*")).cast("bigint").alias(
                "collisions"
            ),
            F.sum((F.col("idx") + 1) * F.col("v")).cast("bigint").alias(
                "vec_checksum"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Posting-list delta compression audit (inverted-index maintenance)
# --------------------------------------------------------------------------

PL_TOP = 40

_PL_ORACLE = f"""
    WITH w AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS term, doc_id
        FROM documents
    ), g AS (
        SELECT term,
               COALESCE(doc_id - LAG(doc_id) OVER
                            (PARTITION BY term ORDER BY doc_id),
                        doc_id + 1) AS gap
        FROM w
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(COUNT(*) * 64 AS BIGINT) AS raw_bits,
           CAST(SUM(LENGTH(bin(gap))) AS BIGINT) AS delta_bits,
           CAST(SUM((LENGTH(bin(gap)) + 6) // 7) AS BIGINT) AS vbyte_bytes,
           CAST((COUNT(*) * 64 - SUM(LENGTH(bin(gap)))) * 10000
                // (COUNT(*) * 64) AS BIGINT) AS savings_bp
    FROM g GROUP BY term
    ORDER BY df DESC, term LIMIT {PL_TOP}
"""


@declared("q_postings_compression", oracle=_PL_ORACLE)
def q_postings_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index posting-list compression audit: each term's sorted
    distinct doc_id postings are delta-encoded (first gap = doc_id + 1 so
    every gap is a positive integer) and costed two ways — minimal binary
    (sum of gap bit-lengths, the entropy-ish floor) and varint/vbyte
    (ceil(bits/7) bytes, what Lucene-style indexes actually write). Per
    term: document frequency, raw 64-bit cost, both compressed costs, and
    the savings in basis points; top PL_TOP terms by df. This is the
    index-maintenance arithmetic a 100 TB search/dedup layer runs to size
    its postings storage.

    Engine-exactness: gaps are positive BIGINTs, bit-length via
    LENGTH(bin(gap)) (identical on positives); savings_bp is one floor
    division of non-negatives; (df DESC, term) is a total order.

    Scale notes (100 TB): one distinct + one groupBy, both keyed by term
    (the distinct pre-shuffles by (term, doc_id), so the gap/bit transform
    rides the same partitioning); the sorted-array aggregate keeps each
    posting list on one reducer — exactly how the real index shards — and
    per-term state is the list itself, capped in production by df
    (stopword lists are the known mitigation, cf. q_heavy_hitters)."""
    t = load_tables(spark, sf_dir)
    w = (
        t.documents.select(
            F.explode(F.split("text", " ")).alias("term"), "doc_id"
        ).distinct()
    )
    g = w.groupBy("term").agg(
        F.expr("array_sort(collect_list(doc_id))").alias("ps")
    ).select(
        "term",
        F.expr(
            "transform(ps, (d, i) -> CASE WHEN i = 0 THEN d + 1"
            " ELSE d - ps[i - 1] END)"
        ).alias("gaps"),
    )
    return (
        g.select(
            "term",
            F.expr("CAST(size(gaps) AS BIGINT)").alias("df"),
            F.expr("CAST(size(gaps) * 64 AS BIGINT)").alias("raw_bits"),
            F.expr(
                "CAST(aggregate(gaps, 0L, (a, x) -> a + length(bin(x)))"
                " AS BIGINT)"
            ).alias("delta_bits"),
            F.expr(
                "CAST(aggregate(gaps, 0L,"
                " (a, x) -> a + (length(bin(x)) + 6) div 7) AS BIGINT)"
            ).alias("vbyte_bytes"),
        )
        .withColumn(
            "savings_bp",
            F.expr("CAST((raw_bits - delta_bits) * 10000 div raw_bits AS BIGINT)"),
        )
        .orderBy(F.desc("df"), "term")
        .limit(PL_TOP)
    )


# --------------------------------------------------------------------------
# Skip-gram pair generation (word2vec data prep, window = SG_WINDOW)
# --------------------------------------------------------------------------

SG_WINDOW = 2
SG_TOP = 40

_SG_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), pos AS (
        SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w
        FROM d
    ), pairs AS (
        SELECT c.doc_id, c.w AS center, x.w AS context
        FROM pos c JOIN pos x
          ON x.doc_id = c.doc_id
         AND x.i BETWEEN c.i - {SG_WINDOW} AND c.i + {SG_WINDOW}
         AND x.i <> c.i
    )
    SELECT center, context,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM pairs GROUP BY center, context
    ORDER BY n_pairs DESC, center, context LIMIT {SG_TOP}
"""


@declared("q_skipgram", oracle=_SG_ORACLE)
def q_skipgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram (center, context) pair extraction — the word2vec /
    contrastive-embedding training-data prep: every position pairs with
    every other position within SG_WINDOW tokens, pairs are counted
    globally plus by document support, and the SG_TOP most frequent pairs
    are returned. The pair-count table IS the co-occurrence training set
    (and the input q_pmi would consume for association scoring).

    Engine-exactness: pure integer counts over exact string pairs;
    (n_pairs DESC, center, context) is a total order.

    Scale notes (100 TB): pairs are generated ARRAY-SIDE (a transform over
    each doc's token array, exploded once) rather than by the positional
    self-join the oracle uses — no join, no doc_id shuffle, window
    membership resolved per-row in whole-stage codegen; the only shuffle
    is the final pair-count groupBy, which map-side combines (Zipfian
    pairs concentrate, so the combiner absorbs the skew; cf.
    q_topk_salted for the salted variant if a pair ever dominates)."""
    t = load_tables(spark, sf_dir)
    pairs = t.documents.select(
        "doc_id",
        F.explode(
            F.expr(
                "flatten(transform(split(text, ' '), (cw, i) ->"
                " filter(transform("
                f"   sequence(greatest(0, i - {SG_WINDOW}),"
                f"            least(size(split(text, ' ')) - 1, i + {SG_WINDOW})),"
                "    j -> IF(j = i, CAST(NULL AS STRUCT<c: STRING, x: STRING>),"
                "            struct(cw AS c, split(text, ' ')[j] AS x))),"
                "  p -> p IS NOT NULL)))"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.c").alias("center"), F.col("p.x").alias("context")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy(F.desc("n_pairs"), "center", "context")
        .limit(SG_TOP)
    )


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (sign matrix, k = RP_K)
# --------------------------------------------------------------------------

RP_K = 8  # projected dimensionality
RP_FX = 1_000_000  # element quantization (house FX_SCALE)
RP_RATIO_SCALE = 10_000
# Overflow bound: |q_j| <= ~0.53e6 on unit vectors, orig_sq <= 64e12;
# Cauchy-Schwarz gives p_i^2 <= 64 * orig_sq, so proj_sq <= 8*64*orig_sq
# <= 3.3e16 and ratio numerator <= proj_sq * 1e4 <= 3.3e20 / ... bounded
# in practice by proj_sq ~ k * orig_sq ~ 8e12; the CS worst case 5.1e18
# stays under 2^63 because orig_sq <= 1.01e12 on unit-norm input.

_RP_ORACLE = f"""
    WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * {RP_FX})
                    AS BIGINT) AS q
        FROM embeddings
    ), proj AS (
        SELECT ex.vec_id, r.i,
               CAST(SUM(CASE WHEN
                   ({_DUCK_H60.format(arg="'rp|' || r.i || '|' || ex.j")}) & 1 = 0
                   THEN ex.q ELSE -ex.q END) AS BIGINT) AS p
        FROM ex, (SELECT unnest(range({RP_K})) AS i) r
        GROUP BY ex.vec_id, r.i
    ), o AS (
        SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS orig_sq FROM ex
        GROUP BY vec_id
    )
    SELECT o.vec_id, o.orig_sq,
           CAST(SUM(p.p * p.p) AS BIGINT) AS proj_sq,
           CAST(SUM(p.p * p.p) * {RP_RATIO_SCALE}
                // ({RP_K} * o.orig_sq) AS BIGINT) AS ratio_fx
    FROM o JOIN proj p ON p.vec_id = o.vec_id
    GROUP BY o.vec_id, o.orig_sq
    ORDER BY o.vec_id
"""


@declared("q_random_projection", oracle=_RP_ORACLE)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection with a deterministic ±1
    sign matrix (Achlioptas 2003): R[i][j] = ±1 from bit 0 of
    md5('rp|i|j'), projecting each 64-dim embedding to RP_K dims in pure
    integer arithmetic on RP_FX-quantized elements. Per vector: original
    and projected squared norms and their fixed-point ratio against the
    JL expectation E[||Rx||^2] = k·||x||^2 (ratio_fx concentrates around
    RP_RATIO_SCALE) — the cheap dimensionality reduction a pipeline runs
    before ANN indexing or dedup banding when 64 dims is already too wide
    to shuffle at 100 TB.

    Engine-exactness: the sign matrix is hash-derived (no RNG state);
    products and sums are BIGINT (bounds in the comment above); the one
    floor division is on non-negatives (squared norms); vec_id is a total
    order.

    Scale notes (100 TB): the projection is a map-side explode x RP_K
    followed by a (vec_id, i) partial-aggregable SUM — the R matrix is
    never materialized or broadcast (each cell's sign is recomputed from
    its hash, the stateless-matrix trick), so the operator ships zero
    side data and shuffles only on vec_id."""
    t = load_tables(spark, sf_dir)
    ex = t.embeddings.select(
        "vec_id", F.posexplode("embedding").alias("j", "e")
    ).select(
        "vec_id",
        "j",
        F.expr(f"CAST(ROUND(CAST(e AS DOUBLE) * {RP_FX}, 0) AS BIGINT)").alias("q"),
    )
    proj = (
        ex.select(
            "vec_id", "j", "q",
            F.explode(F.sequence(F.lit(0), F.lit(RP_K - 1))).alias("i"),
        )
        .groupBy("vec_id", "i")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN "
                + _SPARK_H60.format(arg="concat('rp|', i, '|', j)")
                + " & 1 = 0 THEN q ELSE -q END) AS BIGINT)"
            ).alias("p")
        )
    )
    o = ex.groupBy("vec_id").agg(
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("orig_sq")
    )
    return (
        proj.groupBy("vec_id")
        .agg(F.sum(F.col("p") * F.col("p")).cast("bigint").alias("proj_sq"))
        .join(o, "vec_id")
        .select(
            "vec_id",
            "orig_sq",
            "proj_sq",
            F.expr(
                f"CAST(proj_sq * {RP_RATIO_SCALE} div ({RP_K} * orig_sq)"
                " AS BIGINT)"
            ).alias("ratio_fx"),
        )
        .orderBy("vec_id")
    )
