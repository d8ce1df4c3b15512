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


# --------------------------------------------------------------------------
# Kolmogorov-Smirnov drift statistic (each source vs the rest of the corpus)
# --------------------------------------------------------------------------

_KS_ORACLE = """
    WITH lc AS (
        SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, n_chars
    ), tot AS (
        SELECT v, CAST(SUM(c) AS BIGINT) AS c FROM lc GROUP BY v
    ), ns AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM lc GROUP BY source
    ), n AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM tot
    ), thr AS (
        SELECT DISTINCT v FROM tot
    ), cum_s AS (
        SELECT s.source, t.v,
               CAST(COALESCE(SUM(lc.c), 0) AS BIGINT) AS cs
        FROM (SELECT DISTINCT source FROM lc) s
        CROSS JOIN thr t
        LEFT JOIN lc ON lc.source = s.source AND lc.v <= t.v
        GROUP BY s.source, t.v
    ), cum_all AS (
        SELECT t.v, CAST(SUM(tot.c) AS BIGINT) AS ca
        FROM thr t JOIN tot ON tot.v <= t.v GROUP BY t.v
    )
    SELECT cs.source, ns.n_s,
           CAST(n.n_all - ns.n_s AS BIGINT) AS n_rest,
           CAST(MAX(ABS(cs.cs * (n.n_all - ns.n_s)
                        - (cum_all.ca - cs.cs) * ns.n_s)) AS BIGINT) AS ks_num,
           CAST(MAX(ABS(cs.cs * (n.n_all - ns.n_s)
                        - (cum_all.ca - cs.cs) * ns.n_s)) * 10000
                // (ns.n_s * (n.n_all - ns.n_s)) AS BIGINT) AS ks_bp
    FROM cum_s cs
    JOIN cum_all ON cum_all.v = cs.v
    JOIN ns ON ns.source = cs.source
    CROSS JOIN n
    GROUP BY cs.source, ns.n_s, n.n_all
    ORDER BY ks_bp DESC, cs.source
"""


@declared("q_ks_drift", oracle=_KS_ORACLE)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic, each source vs the
    rest of the corpus, over the document length (n_chars) distribution:
    D = max_v |F_s(v) - F_rest(v)|, computed EXACTLY as the integer
    numerator max_v |cum_s(v)·N_rest - cum_rest(v)·N_s| over the common
    denominator N_s·N_rest, reported in basis points. The
    distribution-shape complement to q_drift_tvd's bucketed total
    variation — KS catches a shifted length distribution TVD's coarse
    buckets can miss, the ingest-monitoring alarm for a drifting source.

    Engine-exactness: cumulative counts are exact integer ECDFs (the
    oracle states them as a bounded non-equi threshold join; the Spark
    plan computes the SAME values as a per-source partitioned prefix-sum
    window over the dense source x threshold grid — hash-identical, and
    the corpus ECDF is the per-source ECDFs summed); one floor division
    of non-negatives; (ks_bp DESC, source) is a total order.

    Scale notes (100 TB): everything after the first groupBy runs on the
    (source x distinct-length) grid, whose size is bounded by the length
    domain (= max doc bytes), NOT corpus rows; the grid is built by one
    EQUI join (the r7 plan rewrite — the literal non-equi join the oracle
    uses was a |grid|^2 nested loop, 6.2 s -> sub-second at sf0.1) and
    the prefix sums are windows PARTITIONED by source (the global-window
    ledger stays untouched); at a larger length domain, bucket first
    (q_drift_tvd)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    lc = t.documents.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    lc.persist()  # three aggregates below share it
    tot = lc.groupBy("v").agg(F.sum("c").cast("bigint").alias("c"))
    ns = lc.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_s"))
    thr = tot.select("v").distinct()
    srcs = lc.select("source").distinct()
    wcum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_s = (
        srcs.crossJoin(thr)
        .join(lc, ["source", "v"], "left")
        .select(
            "source", "v", F.coalesce("c", F.lit(0)).cast("bigint").alias("cnt")
        )
        .select(
            "source", "v", F.sum("cnt").over(wcum).cast("bigint").alias("cs")
        )
    )
    cum_s.persist()  # feeds the deviation join AND the summed corpus ECDF
    cum_all = cum_s.groupBy("v").agg(F.sum("cs").cast("bigint").alias("ca"))
    n_all = tot.agg(F.sum("c").cast("bigint").alias("n_all"))
    d = (
        cum_s.join(cum_all, "v")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n_all))
        .select(
            "source",
            "n_s",
            (F.col("n_all") - F.col("n_s")).cast("bigint").alias("n_rest"),
            F.abs(
                F.col("cs") * (F.col("n_all") - F.col("n_s"))
                - (F.col("ca") - F.col("cs")) * F.col("n_s")
            ).alias("dev"),
        )
    )
    return (
        d.groupBy("source", "n_s", "n_rest")
        .agg(F.max("dev").cast("bigint").alias("ks_num"))
        .withColumn(
            "ks_bp",
            F.expr("CAST(ks_num * 10000 div (n_s * n_rest) AS BIGINT)"),
        )
        .orderBy(F.desc("ks_bp"), "source")
    )


# --------------------------------------------------------------------------
# One-vs-rest AUC via exact Mann-Whitney rank statistics (windowless)
# --------------------------------------------------------------------------

AUC_FX = 1_000_000  # score quantization (house FX_SCALE)

_AUC_ORACLE = f"""
    WITH sc AS (
        SELECT label,
               CAST(ROUND(CAST(embedding[1] AS DOUBLE) * {AUC_FX}) AS BIGINT)
                   AS v
        FROM embeddings
    ), p AS (
        SELECT label, v, CAST(COUNT(*) AS BIGINT) AS pos
        FROM sc GROUP BY label, v
    ), tot AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM sc GROUP BY v
    ), nl AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_pos FROM sc GROUP BY label
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM sc
    ), gt_all AS (
        SELECT p.label, CAST(SUM(p.pos * t.c) AS BIGINT) AS s
        FROM p JOIN tot t ON t.v < p.v GROUP BY p.label
    ), gt_same AS (
        SELECT a.label, CAST(SUM(a.pos * b.pos) AS BIGINT) AS s
        FROM p a JOIN p b ON b.label = a.label AND b.v < a.v
        GROUP BY a.label
    ), tie AS (
        SELECT p.label,
               CAST(SUM(p.pos * (t.c - p.pos)) AS BIGINT) AS s
        FROM p JOIN tot t ON t.v = p.v GROUP BY p.label
    )
    SELECT nl.label, nl.n_pos,
           CAST(n.n_all - nl.n_pos AS BIGINT) AS n_neg,
           CAST(2 * (COALESCE(ga.s, 0) - COALESCE(gs.s, 0))
                + COALESCE(ti.s, 0) AS BIGINT) AS u2,
           CAST((2 * (COALESCE(ga.s, 0) - COALESCE(gs.s, 0))
                 + COALESCE(ti.s, 0)) * 10000
                // (2 * nl.n_pos * (n.n_all - nl.n_pos)) AS BIGINT) AS auc_bp
    FROM nl CROSS JOIN n
    LEFT JOIN gt_all ga ON ga.label = nl.label
    LEFT JOIN gt_same gs ON gs.label = nl.label
    LEFT JOIN tie ti ON ti.label = nl.label
    ORDER BY nl.label
"""


@declared("q_auc", oracle=_AUC_ORACLE)
def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest AUC for every class label, with the first embedding
    dimension as the scoring function — the classifier-eval primitive a
    training pipeline runs on every eval dump. Computed EXACTLY as the
    Mann-Whitney U statistic in integers: u2 = 2·#{score_pos > score_neg}
    + #{ties} (the 2x carries tie half-credit without fractions), and
    AUC = u2 / (2·n_pos·n_neg) reported in basis points.

    Engine-exactness: scores are AUC_FX-quantized integers; the
    pos-beats-neg pair count is assembled from grouped per-value counts
    via bounded theta-joins (the windowless-rank house trick, keeping the
    global-window ledger untouched); one floor division of non-negatives;
    label is a total order.

    Scale notes (100 TB): all joins run on the per-(label, distinct
    score) table — bounded by the quantization grid (2·AUC_FX values),
    not by corpus rows; at a finer grid, the same counts fall out of one
    partitioned-by-label window over the sorted score table (the
    sort-merge ECDF), which is the plan to switch to when |distinct
    scores| approaches row count."""
    t = load_tables(spark, sf_dir)
    sc = t.embeddings.select(
        "label",
        F.expr(
            f"CAST(ROUND(CAST(embedding[0] AS DOUBLE) * {AUC_FX}, 0) AS BIGINT)"
        ).alias("v"),
    )
    sc.persist()  # four aggregates below share it
    p = sc.groupBy("label", "v").agg(F.count("*").cast("bigint").alias("pos"))
    p.persist()  # self-join + two theta-joins below
    tot = sc.groupBy("v").agg(F.count("*").cast("bigint").alias("c"))
    nl = sc.groupBy("label").agg(F.count("*").cast("bigint").alias("n_pos"))
    n = sc.agg(F.count("*").cast("bigint").alias("n_all"))
    gt_all = (
        p.alias("p")
        .join(F.broadcast(tot.alias("t")), F.col("t.v") < F.col("p.v"))
        .groupBy("p.label")
        .agg(F.sum(F.col("p.pos") * F.col("t.c")).cast("bigint").alias("ga"))
    )
    gt_same = (
        p.alias("a")
        .join(
            F.broadcast(p.select(
                F.col("label").alias("bl"), F.col("v").alias("bv"),
                F.col("pos").alias("bpos"),
            )),
            (F.col("bl") == F.col("a.label")) & (F.col("bv") < F.col("a.v")),
        )
        .groupBy("a.label")
        .agg(F.sum(F.col("a.pos") * F.col("bpos")).cast("bigint").alias("gs"))
    )
    tie = (
        p.alias("p")
        .join(F.broadcast(tot.alias("t")), F.col("t.v") == F.col("p.v"))
        .groupBy("p.label")
        .agg(
            F.sum(F.col("p.pos") * (F.col("t.c") - F.col("p.pos")))
            .cast("bigint")
            .alias("ti")
        )
    )
    return (
        nl.crossJoin(F.broadcast(n))
        .join(gt_all, "label", "left")
        .join(gt_same, "label", "left")
        .join(tie, "label", "left")
        .select(
            "label",
            "n_pos",
            (F.col("n_all") - F.col("n_pos")).cast("bigint").alias("n_neg"),
            (
                2 * (F.coalesce("ga", F.lit(0)) - F.coalesce("gs", F.lit(0)))
                + F.coalesce("ti", F.lit(0))
            )
            .cast("bigint")
            .alias("u2"),
        )
        .withColumn(
            "auc_bp",
            F.expr("CAST(u2 * 10000 div (2 * n_pos * n_neg) AS BIGINT)"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Integer power iteration (dominant Gram eigenvector, 2 unrolled steps)
# --------------------------------------------------------------------------

PI_FX = 1_000_000  # element quantization AND iterate normalization scale
PI_N_MAX = 1_000_000  # int64 safety: n * (PI_FX)^2 <= 1e18 < 2^63
# signed floor-vs-trunc guard: both engines split sign so the division
# runs on non-negatives, where Spark `div` and DuckDB `//` agree
_SPARK_SDIV = "CASE WHEN {x} < 0 THEN -((-({x})) div {y}) ELSE ({x}) div {y} END"
_DUCK_SDIV = "CASE WHEN {x} < 0 THEN -((-({x})) // {y}) ELSE ({x}) // {y} END"

_PI_ORACLE = f"""
    WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * {PI_FX})
                    AS BIGINT) AS q
        FROM embeddings
    ), nv AS (
        SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT)
               + COALESCE(CASE WHEN COUNT(DISTINCT vec_id) > {PI_N_MAX}
                   THEN CAST(error('q_power_iteration: vector count exceeds the int64-safe bound') AS BIGINT)
                 END, 0) AS n
        FROM ex
    ), gram AS (
        SELECT a.i AS i, b.i AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS g
        FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY a.i, b.i
    ), cs AS (
        SELECT i, j,
               CAST({_DUCK_SDIV.format(x="g", y=PI_FX)} AS BIGINT) AS g
        FROM gram
    ), w1 AS (
        SELECT i, CAST(SUM(g) * {PI_FX} AS BIGINT) AS w FROM cs GROUP BY i
    ), m1 AS (
        SELECT GREATEST(MAX(ABS(w)) // {PI_FX}, 1) AS m FROM w1
    ), v1 AS (
        SELECT i, CAST({_DUCK_SDIV.format(x="w1.w", y="m1.m")} AS BIGINT) AS v
        FROM w1, m1
    ), w2 AS (
        SELECT cs.i, CAST(SUM(cs.g * v1.v) AS BIGINT) AS w
        FROM cs JOIN v1 ON v1.i = cs.j GROUP BY cs.i
    ), m2 AS (
        SELECT GREATEST(MAX(ABS(w)) // {PI_FX}, 1) AS m FROM w2
    ), v2 AS (
        SELECT i, CAST({_DUCK_SDIV.format(x="w2.w", y="m2.m")} AS BIGINT) AS v
        FROM w2, m2
    )
    SELECT v1.i AS dim, nv.n AS n_vec,
           v1.v AS v1_fx, v2.v AS v2_fx,
           CAST(ABS(v2.v - v1.v) AS BIGINT) AS delta_fx
    FROM v1 JOIN v2 ON v2.i = v1.i CROSS JOIN nv
    ORDER BY dim
"""


@declared("q_power_iteration", oracle=_PI_ORACLE)
def q_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power iteration for the dominant eigenvector of the embedding Gram
    matrix, run for two UNROLLED steps entirely in integer fixed point —
    the iterative-algorithm pattern (PCA direction, spectral dedup
    centroid, PageRank's linear-algebra core) expressed relationally and
    engine-exactly. Start from the all-ones vector (x PI_FX); each step is
    a relational mat-vec (join Gram on j, SUM by i) followed by an
    exactly-specified normalization: divide by max(|w|) div PI_FX with
    sign-split floor division, keeping the iterate's magnitude near PI_FX.
    Per dimension: both iterates and their movement |v2 - v1| (the
    convergence readout; the dominant eigengap sets its decay).

    Engine-exactness: the Gram matrix is an integer outer-product sum of
    PI_FX-quantized elements; every division is sign-split onto
    non-negatives (Spark div truncates, DuckDB // floors — they agree
    there); the int64 bound n_vec <= PI_N_MAX (n·FX^2 <= 1e18) is ENFORCED
    in-plan on both engines (Spark assert_true / DuckDB error(), the
    q_embed_cov pattern, similarity.py:1386) via the n_vec output column
    so Catalyst cannot prune the guard.

    Scale notes (100 TB): the only corpus-sized stage is the Gram
    outer-product aggregate — map-side combinable into at most d^2 = 4096
    cells per partition (the classic treeAggregate Gram pattern; cf.
    q_embed_cov's mapInPandas variant which does the same with vectorized
    batches); both iterations run on the 4096-row Gram x 64-row iterate —
    broadcast joins, zero additional passes over the data. More steps =
    more 4096-row joins, each a few milliseconds, which is why production
    power iteration on a 1000-executor cluster aggregates once and
    iterates driver-adjacent."""
    t = load_tables(spark, sf_dir)
    ex = t.embeddings.select(
        "vec_id",
        F.posexplode("embedding").alias("i", "e"),
    ).select(
        "vec_id",
        "i",
        F.expr(f"CAST(ROUND(CAST(e AS DOUBLE) * {PI_FX}, 0) AS BIGINT)").alias("q"),
    )
    ex.persist()  # Gram self-join probes it twice; nv re-reads it
    nv = ex.agg(
        (
            F.countDistinct("vec_id").cast("bigint")
            + F.coalesce(
                F.assert_true(
                    F.countDistinct("vec_id") <= PI_N_MAX,
                    "q_power_iteration: vector count exceeds the int64-safe bound",
                ).cast("bigint"),
                F.lit(0),
            )
        ).alias("n_vec")
    )
    gram = (
        ex.alias("a")
        .join(
            ex.select(
                F.col("vec_id").alias("bv"),
                F.col("i").alias("j"),
                F.col("q").alias("bq"),
            ).alias("b"),
            F.col("a.vec_id") == F.col("bv"),
        )
        .groupBy("a.i", "j")
        .agg(F.sum(F.col("a.q") * F.col("bq")).cast("bigint").alias("g"))
    )
    cs = gram.select(
        "i", "j",
        F.expr(
            "CAST(" + _SPARK_SDIV.format(x="g", y=PI_FX) + " AS BIGINT)"
        ).alias("g"),
    )
    cs.persist()  # feeds both mat-vec steps
    w1 = cs.groupBy("i").agg(
        (F.sum("g") * PI_FX).cast("bigint").alias("w")
    )
    m1 = w1.agg(
        F.expr(f"GREATEST(MAX(ABS(w)) div {PI_FX}, 1)").alias("m")
    )
    v1 = w1.crossJoin(F.broadcast(m1)).select(
        "i",
        F.expr(
            "CAST(" + _SPARK_SDIV.format(x="w", y="m") + " AS BIGINT)"
        ).alias("v"),
    )
    w2 = (
        cs.join(
            F.broadcast(v1.select(F.col("i").alias("j"), "v")), "j"
        )
        .groupBy("i")
        .agg(F.sum(F.col("g") * F.col("v")).cast("bigint").alias("w"))
    )
    m2 = w2.agg(
        F.expr(f"GREATEST(MAX(ABS(w)) div {PI_FX}, 1)").alias("m")
    )
    v2 = w2.crossJoin(F.broadcast(m2)).select(
        "i",
        F.expr(
            "CAST(" + _SPARK_SDIV.format(x="w", y="m") + " AS BIGINT)"
        ).alias("v"),
    )
    return (
        v1.select(F.col("i").alias("dim"), F.col("v").alias("v1_fx"))
        .join(
            v2.select(F.col("i").alias("dim"), F.col("v").alias("v2_fx")),
            "dim",
        )
        .crossJoin(F.broadcast(nv))
        .select(
            "dim",
            "n_vec",
            "v1_fx",
            "v2_fx",
            F.abs(F.col("v2_fx") - F.col("v1_fx")).cast("bigint").alias("delta_fx"),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# Consistent-hash ring rebalance audit (add one shard, measure movement)
# --------------------------------------------------------------------------

CH_SHARDS = 8  # shards before the expansion
CH_VNODES = 16  # virtual nodes per shard on the ring

_CH_RING = f"""
        SELECT s.s AS shard, {_DUCK_H60.format(arg="'ring|' || s.s || '|' || v.v")} AS pt
        FROM (SELECT unnest(range({{n}})) AS s) s,
             (SELECT unnest(range({CH_VNODES})) AS v) v
"""

_CH_ASSIGN = f"""
        SELECT d.doc_id,
               COALESCE(MIN(r.pt) FILTER (WHERE r.pt >= d.pos),
                        (SELECT MIN(pt) FROM ring{{tag}})) AS pt
        FROM pos d CROSS JOIN ring{{tag}} r
        GROUP BY d.doc_id
"""

_CH_ORACLE = f"""
    WITH pos AS (
        SELECT doc_id, {_DUCK_H60.format(arg="'doc|' || doc_id")} AS pos
        FROM documents
    ), ring_b AS ({_CH_RING.format(n=CH_SHARDS)}
    ), ring_a AS ({_CH_RING.format(n=CH_SHARDS + 1)}
    ), succ_b AS ({_CH_ASSIGN.format(tag='_b')}
    ), succ_a AS ({_CH_ASSIGN.format(tag='_a')}
    ), assign AS (
        SELECT sb.doc_id, rb.shard AS before, ra.shard AS after
        FROM succ_b sb
        JOIN ring_b rb ON rb.pt = sb.pt
        JOIN succ_a sa ON sa.doc_id = sb.doc_id
        JOIN ring_a ra ON ra.pt = sa.pt
    ), shards AS (
        SELECT unnest(range({CH_SHARDS + 1})) AS shard
    )
    SELECT s.shard,
           CAST(COUNT(*) FILTER (WHERE a.before = s.shard) AS BIGINT)
               AS n_before,
           CAST(COUNT(*) FILTER (WHERE a.after = s.shard) AS BIGINT)
               AS n_after,
           CAST(COUNT(*) FILTER (WHERE a.before = s.shard
                                   AND a.after <> s.shard) AS BIGINT) AS lost,
           CAST(COUNT(*) FILTER (WHERE a.after = s.shard
                                   AND a.before <> s.shard) AS BIGINT)
               AS gained
    FROM shards s CROSS JOIN assign a
    GROUP BY s.shard ORDER BY s.shard
"""


@declared("q_consistent_hash", oracle=_CH_ORACLE)
def q_consistent_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring rebalance audit (Karger et al. 1997): CH_SHARDS
    shards x CH_VNODES virtual nodes on a 60-bit hash ring, each document
    owned by the successor virtual node of its hash (wrapping to the ring
    minimum); then shard CH_SHARDS joins the ring and the assignment is
    recomputed. Per shard: population before/after, documents lost and
    gained — the output PROVES the minimal-disruption property (every old
    shard has gained = 0: documents only move TO the new shard, ~1/(n+1)
    of them), which is exactly the audit a 100 TB storage layer runs
    before a live resharding.

    Engine-exactness: ring points and document positions are md5-60
    integers (collision-free at these cardinalities and deterministic
    regardless); successor = MIN(point >= pos) with the wrap as a
    COALESCE to the global minimum; point is a unique join-back key to its
    shard, so no arg-min tie ambiguity; shard is a total order.

    Scale notes (100 TB): the ring ((n+1)·CH_VNODES rows) is BROADCAST to
    a non-equi join — per doc at most ring-size candidates reduced
    map-side by the MIN partial, so assignment is a single map-only pass
    over documents (no shuffle at all until the final 9-group count);
    production rings with 1e4+ vnodes would pre-sort the ring and
    binary-search per row (a bounded higher-order expr), same plan
    shape."""
    t = load_tables(spark, sf_dir)
    pos = t.documents.select(
        "doc_id",
        F.expr(_SPARK_H60.format(arg="concat('doc|', doc_id)")).alias("pos"),
    )
    pos.persist()  # both ring assignments scan it

    def ring(n: int) -> DataFrame:
        return (
            spark.range(n)
            .select(F.col("id").alias("shard"))
            .select(
                "shard",
                F.explode(F.sequence(F.lit(0), F.lit(CH_VNODES - 1))).alias("v"),
            )
            .select(
                "shard",
                F.expr(
                    _SPARK_H60.format(arg="concat('ring|', shard, '|', v)")
                ).alias("pt"),
            )
        )

    def assign(r: DataFrame, col: str) -> DataFrame:
        r.persist()  # successor join + wrap minimum + shard join-back
        wrap = r.agg(F.min("pt").alias("wrap_pt"))
        succ = (
            pos.join(F.broadcast(r), F.col("pt") >= F.col("pos"), "left")
            .groupBy("doc_id")
            .agg(F.min("pt").alias("succ_pt"))
            .crossJoin(F.broadcast(wrap))
            .select(
                "doc_id",
                F.coalesce("succ_pt", "wrap_pt").alias("succ_pt"),
            )
        )
        return succ.join(
            F.broadcast(r), F.col("succ_pt") == F.col("pt")
        ).select("doc_id", F.col("shard").alias(col))

    a = assign(ring(CH_SHARDS), "before").join(
        assign(ring(CH_SHARDS + 1), "after"), "doc_id"
    )
    shards = spark.range(CH_SHARDS + 1).select(F.col("id").alias("shard"))
    return (
        F.broadcast(shards)
        .crossJoin(a)
        .groupBy("shard")
        .agg(
            F.sum(F.when(F.col("before") == F.col("shard"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_before"),
            F.sum(F.when(F.col("after") == F.col("shard"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_after"),
            F.sum(
                F.when(
                    (F.col("before") == F.col("shard"))
                    & (F.col("after") != F.col("shard")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("lost"),
            F.sum(
                F.when(
                    (F.col("after") == F.col("shard"))
                    & (F.col("before") != F.col("shard")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("gained"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# Merkle integrity tree per source (content-addressed transfer audit)
# --------------------------------------------------------------------------

MK_LEAVES = 32  # leaf buckets per source (doc_id mod MK_LEAVES)

_MK_ORACLE = f"""
    WITH leafdoc AS (
        SELECT source, doc_id % {MK_LEAVES} AS b, doc_id, md5(text) AS h
        FROM documents
    ), leaf AS (
        SELECT source, b,
               md5(string_agg(h, '' ORDER BY doc_id)) AS lh,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM leafdoc GROUP BY source, b
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_leaves,
           md5(string_agg(lh, '' ORDER BY b)) AS root
    FROM leaf GROUP BY source ORDER BY source
"""


@declared("q_merkle", oracle=_MK_ORACLE)
def q_merkle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Merkle integrity tree: documents hash to md5 leaves,
    bucket into MK_LEAVES leaf nodes by doc_id mod MK_LEAVES (leaf hash =
    md5 of the doc hashes concatenated in doc_id order), and the source
    root is md5 of the leaf hashes in bucket order — the
    content-addressed fingerprint two sides of a 100 TB data transfer
    exchange to find WHICH bucket diverged (walk down only the mismatched
    subtree) instead of re-checksumming the world. One row per source
    with its document count, populated-leaf count, and root digest.

    Engine-exactness: md5 over hex strings is byte-identical (corpus is
    ASCII-guarded, multimodal.py oracle note); ordered in-group
    concatenation uses the LISTAGG-parity construction (Spark array_join
    of the struct-sorted collect_list == DuckDB string_agg ORDER BY);
    source is a total order.

    Scale notes (100 TB): both levels are partial-aggregable groupBys
    keyed (source, bucket) then source; per-leaf state is the doc-hash
    list (32 hex chars per doc — the reason real trees go deeper: add
    doc_id div MK_LEAVES levels to bound any single aggregation, same
    two-operator pattern stacked log-fold); the final level is one row
    per source x MK_LEAVES fixed-width digests."""
    t = load_tables(spark, sf_dir)
    leafdoc = t.documents.select(
        "source",
        (F.col("doc_id") % MK_LEAVES).alias("b"),
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("h"),
    )
    leaf = leafdoc.groupBy("source", "b").agg(
        F.md5(
            F.expr(
                "CAST(array_join(transform(array_sort("
                "collect_list(struct(doc_id, h))), s -> s.h), '') AS BINARY)"
            )
        ).alias("lh"),
        F.count("*").cast("bigint").alias("n"),
    )
    return (
        leaf.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_leaves"),
            F.md5(
                F.expr(
                    "CAST(array_join(transform(array_sort("
                    "collect_list(struct(b, lh))), s -> s.lh), '') AS BINARY)"
                )
            ).alias("root"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# MoE top-2 router load audit (expert balance over hash-derived prototypes)
# --------------------------------------------------------------------------

MOE_E = 8  # experts
MOE_FX = 1_000_000

_MOE_ORACLE = f"""
    WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * {MOE_FX})
                    AS BIGINT) AS q
        FROM embeddings
    ), sc AS (
        SELECT ex.vec_id, e.e,
               CAST(SUM(CASE WHEN
                   ({_DUCK_H60.format(arg="'moe|' || e.e || '|' || ex.j")}) & 1 = 0
                   THEN ex.q ELSE -ex.q END) AS BIGINT) AS score
        FROM ex, (SELECT unnest(range({MOE_E})) AS e) e
        GROUP BY ex.vec_id, e.e
    ), ranked AS (
        SELECT vec_id, e, score,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, e) AS r
        FROM sc
    ), nv AS (
        SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM sc
    )
    SELECT r.e AS expert,
           CAST(COUNT(*) FILTER (WHERE r.r = 1) AS BIGINT) AS n_top1,
           CAST(COUNT(*) FILTER (WHERE r.r = 2) AS BIGINT) AS n_top2,
           CAST(SUM(CASE WHEN r.r = 1 THEN r.score ELSE 0 END) AS BIGINT)
               AS top1_mass,
           CAST(COUNT(*) FILTER (WHERE r.r <= 2) * 10000
                // (2 * nv.n) AS BIGINT) AS load_bp
    FROM ranked r CROSS JOIN nv
    WHERE r.r <= 2
    GROUP BY r.e, nv.n ORDER BY r.e
"""


@declared("q_moe_router", oracle=_MOE_ORACLE)
def q_moe_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-of-experts top-2 router load audit (Shazeer et al. 2017 /
    Switch routing): each embedding routes to its two highest-scoring of
    MOE_E experts, where expert prototypes are the stateless hash-derived
    ±1 vectors (the q_random_projection trick — no weights shipped) and
    scores are exact integer dot products. Per expert: top-1 and top-2
    populations, routed top-1 score mass, and the load in basis points of
    total routed slots — the balance readout that decides whether a
    capacity factor or an auxiliary load-balance loss is needed before a
    training run wastes a cluster on overflow drops.

    Engine-exactness: scores are BIGINT sums of signed MOE_FX-quantized
    elements; the top-2 selection is the (score DESC, expert ASC) total
    order materialized Spark-side as a sorted 8-element per-vector array
    (no window at all) and oracle-side as a partitioned ROW_NUMBER —
    identical tiebreak; one floor division of non-negatives.

    Scale notes (100 TB): scoring is a map-side explode x MOE_E with a
    (vec_id, e) partial-aggregable SUM; the per-vector top-2 runs on an
    8-element collected array (bounded by MOE_E, not data); the final
    aggregate is MOE_E rows. One shuffle on vec_id end to end."""
    t = load_tables(spark, sf_dir)
    ex = t.embeddings.select(
        "vec_id", F.posexplode("embedding").alias("j", "e0")
    ).select(
        "vec_id",
        "j",
        F.expr(f"CAST(ROUND(CAST(e0 AS DOUBLE) * {MOE_FX}, 0) AS BIGINT)").alias(
            "q"
        ),
    )
    sc = (
        ex.select(
            "vec_id", "j", "q",
            F.explode(F.sequence(F.lit(0), F.lit(MOE_E - 1))).alias("e"),
        )
        .groupBy("vec_id", "e")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN "
                + _SPARK_H60.format(arg="concat('moe|', e, '|', j)")
                + " & 1 = 0 THEN q ELSE -q END) AS BIGINT)"
            ).alias("score")
        )
    )
    top2 = (
        sc.groupBy("vec_id")
        .agg(
            F.expr(
                # (score DESC, e ASC): sort struct(-score, e) ascending
                "slice(array_sort(collect_list(struct(-score AS ns, e, score))),"
                " 1, 2)"
            ).alias("t2")
        )
        .select(
            F.posexplode("t2").alias("r0", "t")
        )
        .select(
            (F.col("r0") + 1).alias("r"),
            F.col("t.e").alias("e"),
            F.col("t.score").alias("score"),
        )
    )
    top2.persist()  # expert aggregate + the n_vec count below share it
    nv = top2.filter("r = 1").agg(F.count("*").cast("bigint").alias("n"))
    return (
        top2.groupBy("e")
        .agg(
            F.sum(F.when(F.col("r") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_top1"),
            F.sum(F.when(F.col("r") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_top2"),
            F.sum(F.when(F.col("r") == 1, F.col("score")).otherwise(0))
            .cast("bigint")
            .alias("top1_mass"),
            F.count("*").alias("routed"),
        )
        .crossJoin(F.broadcast(nv))
        .select(
            F.col("e").alias("expert"),
            "n_top1",
            "n_top2",
            "top1_mass",
            F.expr("CAST(routed * 10000 div (2 * n) AS BIGINT)").alias("load_bp"),
        )
        .orderBy("expert")
    )


# --------------------------------------------------------------------------
# Wasserstein-1 (earth mover) drift, each source vs the rest of the corpus
# --------------------------------------------------------------------------

_EMD_ORACLE = """
    WITH lc AS (
        SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, n_chars
    ), tot AS (
        SELECT v, CAST(SUM(c) AS BIGINT) AS c FROM lc GROUP BY v
    ), ns AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM lc GROUP BY source
    ), n AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_all,
               CAST(MAX(v) - MIN(v) AS BIGINT) AS vrange
        FROM tot
    ), thr AS (
        SELECT t.v, COALESCE(MIN(u.v), t.v) - t.v AS gap
        FROM tot t LEFT JOIN tot u ON u.v > t.v
        GROUP BY t.v
    ), cum_s AS (
        SELECT s.source, t.v, t.gap,
               CAST(COALESCE(SUM(lc.c), 0) AS BIGINT) AS cs
        FROM (SELECT DISTINCT source FROM lc) s
        CROSS JOIN thr t
        LEFT JOIN lc ON lc.source = s.source AND lc.v <= t.v
        GROUP BY s.source, t.v, t.gap
    ), cum_all AS (
        SELECT t.v, CAST(SUM(tot.c) AS BIGINT) AS ca
        FROM thr t JOIN tot ON tot.v <= t.v GROUP BY t.v
    )
    SELECT cs.source, ns.n_s,
           CAST(n.n_all - ns.n_s AS BIGINT) AS n_rest,
           CAST(SUM(ABS(cs.cs * (n.n_all - ns.n_s)
                        - (cum_all.ca - cs.cs) * ns.n_s) * cs.gap)
                AS BIGINT) AS w1_num,
           CAST(SUM(ABS(cs.cs * (n.n_all - ns.n_s)
                        - (cum_all.ca - cs.cs) * ns.n_s) * cs.gap) * 10000
                // (ns.n_s * (n.n_all - ns.n_s) * n.vrange) AS BIGINT)
               AS emd_bp
    FROM cum_s cs
    JOIN cum_all ON cum_all.v = cs.v
    JOIN ns ON ns.source = cs.source
    CROSS JOIN n
    GROUP BY cs.source, ns.n_s, n.n_all, n.vrange
    ORDER BY emd_bp DESC, cs.source
"""


@declared("q_emd_drift", oracle=_EMD_ORACLE)
def q_emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth mover) drift, each source vs the rest of the
    corpus, over the document-length distribution: W1 = integral of
    |F_s - F_rest| over the support, computed EXACTLY as
    sum_i |cum_s(v_i)·N_rest - cum_rest(v_i)·N_s| · (v_{i+1} - v_i) over
    the common denominator, normalized by the support range into basis
    points. The magnitude-aware complement to q_ks_drift's max deviation
    and q_drift_tvd's bucket mass: KS says the CDFs diverge, W1 says by
    how many characters of transport — the metric a mixture rebalancer
    thresholds on.

    Engine-exactness: the successor gap is a windowless MIN(v' > v) on
    the bounded distinct-length table (no LEAD, the global-window ledger
    stays untouched); numerators are exact integer cross-multiplications;
    cum_s is the per-source partitioned prefix-sum window over the dense
    grid and cum_rest its cross-source sum (the oracle states the same
    values as a non-equi threshold join — hash-identical, q_ks_drift's r7
    plan rewrite); one floor division of non-negatives; (emd_bp DESC,
    source) totals the order.

    Scale notes (100 TB): identical shape to q_ks_drift — everything
    after the first groupBy lives on the (source x distinct-length)
    domain bounded by max doc bytes, not corpus rows; the per-threshold
    work is one extra multiply by the gap."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    lc = t.documents.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    lc.persist()  # four aggregates below share it
    tot = lc.groupBy("v").agg(F.sum("c").cast("bigint").alias("c"))
    tot.persist()  # gap self-join probes it twice + cum_all + the n row
    ns = lc.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_s"))
    thr = (
        tot.alias("t")
        .join(
            tot.select(F.col("v").alias("uv")).alias("u"),
            F.col("uv") > F.col("t.v"),
            "left",
        )
        .groupBy("t.v")
        .agg(
            (F.coalesce(F.min("uv"), F.first("t.v")) - F.first("t.v")).alias(
                "gap"
            )
        )
    )
    srcs = lc.select("source").distinct()
    wcum = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_s = (
        srcs.crossJoin(thr)
        .join(lc, ["source", "v"], "left")
        .select(
            "source", "v", "gap",
            F.coalesce("c", F.lit(0)).cast("bigint").alias("cnt"),
        )
        .select(
            "source", "v", "gap",
            F.sum("cnt").over(wcum).cast("bigint").alias("cs"),
        )
    )
    cum_s.persist()  # feeds the deviation join AND the summed corpus ECDF
    cum_all = cum_s.groupBy("v").agg(F.sum("cs").cast("bigint").alias("ca"))
    n_row = tot.agg(
        F.sum("c").cast("bigint").alias("n_all"),
        (F.max("v") - F.min("v")).cast("bigint").alias("vrange"),
    )
    d = (
        cum_s.join(cum_all, "v")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n_row))
        .select(
            "source",
            "n_s",
            (F.col("n_all") - F.col("n_s")).cast("bigint").alias("n_rest"),
            "vrange",
            (
                F.abs(
                    F.col("cs") * (F.col("n_all") - F.col("n_s"))
                    - (F.col("ca") - F.col("cs")) * F.col("n_s")
                )
                * F.col("gap")
            ).alias("dev"),
        )
    )
    return (
        d.groupBy("source", "n_s", "n_rest", "vrange")
        .agg(F.sum("dev").cast("bigint").alias("w1_num"))
        .select(
            "source",
            "n_s",
            "n_rest",
            "w1_num",
            F.expr(
                "CAST(w1_num * 10000 div (n_s * n_rest * vrange) AS BIGINT)"
            ).alias("emd_bp"),
        )
        .orderBy(F.desc("emd_bp"), "source")
    )


# --------------------------------------------------------------------------
# Modularity of the label-propagation communities (graph-quality readout)
# --------------------------------------------------------------------------

MOD_SCALE = 10_000  # basis points


def _mod_oracle() -> str:
    from .round7 import _PR_GRAPH_CTE, _lp_iter_ctes, LP_ITERS

    sdiv = _DUCK_SDIV.format(
        x=f"(4 * mm.m * agg.m_c - agg.d_c * agg.d_c) * {MOD_SCALE}",
        y="(4 * mm.m * mm.m)",
    )
    return f"""
    WITH {_PR_GRAPH_CTE}, {_lp_iter_ctes()}, comm AS (
        SELECT node, CAST(COALESCE(lbl, -1) AS BIGINT) AS c
        FROM lab{LP_ITERS}
    ), mm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m FROM uedges
    ), intra AS (
        SELECT cu.c, CAST(COUNT(*) AS BIGINT) AS m_c
        FROM uedges e
        JOIN comm cu ON cu.node = e.u
        JOIN comm cv ON cv.node = e.v AND cv.c = cu.c
        GROUP BY cu.c
    ), agg AS (
        SELECT comm.c,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(deg.deg) AS BIGINT) AS d_c,
               CAST(COALESCE(MIN(intra.m_c), 0) AS BIGINT) AS m_c
        FROM comm
        JOIN deg ON deg.node = comm.node
        LEFT JOIN intra ON intra.c = comm.c
        GROUP BY comm.c
    )
    SELECT agg.c AS community, agg.n_nodes, agg.m_c AS intra_edges,
           agg.d_c AS deg_sum,
           CAST({sdiv} AS BIGINT) AS q_contrib_bp
    FROM agg CROSS JOIN mm
    ORDER BY community
"""


@declared("q_modularity", oracle=_mod_oracle())
def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation communities over the
    day-1 co-occurrence graph: Q = sum_c [m_c/m - (d_c/2m)^2], computed
    per community in exact basis points via the cleared-denominator form
    (4·m·m_c - d_c^2)·SCALE / (4·m^2) — the community-quality readout
    that tells a curation pipeline whether the clusters its dedup or
    topic-bucketing stage found are real structure or noise (Q near 0).
    Per community: size, intra-edge count, degree mass, and its signed
    modularity contribution; unreached nodes form community -1.

    Engine-exactness: reuses q_label_prop's propagation core verbatim
    (round7.py label_prop_labels — same total-order argmax), so the
    community assignment is already differentially verified; m_c / d_c /
    m are exact integer counts; the one division is sign-split onto
    non-negatives (contributions CAN be negative when a community's
    degree mass exceeds its internal density).

    Scale notes (100 TB): two node-keyed joins of the edge list against
    the (node, community) table (the PageRank shuffle shape), then
    everything collapses to per-community rows; no new pass over events
    beyond what label propagation already does."""
    from .components import day1_cooccurrence_graph
    from .round7 import day1_propagated_labels

    edges, deg = day1_cooccurrence_graph(spark, sf_dir)
    edges.persist()  # m + the intra join both scan it
    # propagation runs ONCE per session (shared with q_label_prop via the
    # persisted day1_propagated_labels memo — VERDICT r7 #6)
    comm = day1_propagated_labels(spark, sf_dir).select(
        "node", F.coalesce("lbl", F.lit(-1)).cast("bigint").alias("c")
    )
    comm.persist()  # two edge-endpoint joins + the degree join
    mm = edges.agg(F.count("*").cast("bigint").alias("m"))
    intra = (
        edges.join(comm.select(F.col("node").alias("u"), F.col("c").alias("cu")), "u")
        .join(
            comm.select(F.col("node").alias("v"), F.col("c").alias("cv")), "v"
        )
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("c"))
        .agg(F.count("*").cast("bigint").alias("m_c"))
    )
    agg = (
        comm.join(deg, "node")
        .groupBy("c")
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.sum("deg").cast("bigint").alias("d_c"),
        )
        .join(intra, "c", "left")
        .select(
            "c", "n_nodes", "d_c",
            F.coalesce("m_c", F.lit(0)).cast("bigint").alias("m_c"),
        )
    )
    sdiv = _SPARK_SDIV.format(
        x=f"(4 * m * m_c - d_c * d_c) * {MOD_SCALE}", y="(4 * m * m)"
    )
    return (
        agg.crossJoin(F.broadcast(mm))
        .select(
            F.col("c").alias("community"),
            "n_nodes",
            F.col("m_c").alias("intra_edges"),
            F.col("d_c").alias("deg_sum"),
            F.expr(f"CAST({sdiv} AS BIGINT)").alias("q_contrib_bp"),
        )
        .orderBy("community")
    )


# --------------------------------------------------------------------------
# Degree assortativity (integer Pearson over the symmetrized edge list)
# --------------------------------------------------------------------------

def _assort_oracle() -> str:
    from .round7 import _PR_GRAPH_CTE

    sdiv = _DUCK_SDIV.format(
        x=f"(mm.m2 * st.sxy - st.sx * st.sx) * {MOD_SCALE}",
        y="GREATEST(mm.m2 * st.sxx - st.sx * st.sx, 1)",
    )
    return f"""
    WITH {_PR_GRAPH_CTE}, pairs AS (
        SELECT du.deg AS x, dv.deg AS y
        FROM dirn e
        JOIN deg du ON du.node = e.src
        JOIN deg dv ON dv.node = e.dst
    ), mm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM pairs
    ), st AS (
        SELECT CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pairs
    )
    SELECT mm.m2 AS n_edge_ends, st.sx AS sum_deg, st.sxx AS sum_deg_sq,
           st.sxy AS sum_xy,
           CAST({sdiv} AS BIGINT) AS assortativity_bp
    FROM mm CROSS JOIN st
"""


@declared("q_assortativity", oracle=_assort_oracle())
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the day-1 co-occurrence
    graph: the Pearson correlation of endpoint degrees over the
    SYMMETRIZED edge list, where symmetry collapses the usual four-moment
    formula to r = (M·Σxy - (Σx)²) / (M·Σx² - (Σx)²) — entirely integer
    moments, one sign-split division into signed basis points. Positive r
    = hubs attach to hubs (social-graph shape), negative = hub-and-spoke
    (crawl frontier shape); the structure readout that tells a sampling
    stage whether degree-stratified sampling is needed before graph-based
    curation.

    Engine-exactness: degrees and moments are exact BIGINTs over the
    deterministic edge list; the single division is sign-split (r can be
    negative) with a GREATEST(.,1) guard for the degenerate
    constant-degree graph; one output row, no ordering concerns.

    Scale notes (100 TB): two node-keyed joins decorate edge ends with
    degrees (the PageRank shuffle shape), then ONE map-side-combinable
    global moment aggregate — no per-key state at all after the joins;
    moments bound: deg <= n, Σx·x <= M·n² (documented headroom far above
    these SFs; past it, downscale degrees first as q_power_iteration
    does)."""
    from .components import day1_cooccurrence_graph

    edges, deg = day1_cooccurrence_graph(spark, sf_dir)
    dirn = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    pairs = dirn.join(
        deg.select(F.col("node").alias("src"), F.col("deg").alias("x")), "src"
    ).join(
        deg.select(F.col("node").alias("dst"), F.col("deg").alias("y")), "dst"
    )
    sdiv = _SPARK_SDIV.format(
        x=f"(m2 * sxy - sx * sx) * {MOD_SCALE}",
        y="GREATEST(m2 * sxx - sx * sx, 1)",
    )
    return (
        pairs.agg(
            F.count("*").cast("bigint").alias("m2"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        )
        .select(
            F.col("m2").alias("n_edge_ends"),
            F.col("sx").alias("sum_deg"),
            F.col("sxx").alias("sum_deg_sq"),
            F.col("sxy").alias("sum_xy"),
            F.expr(f"CAST({sdiv} AS BIGINT)").alias("assortativity_bp"),
        )
    )


# --------------------------------------------------------------------------
# Welch's t-test on per-user spend (continuous-outcome A/B readout)
# --------------------------------------------------------------------------

# the t chain is ONE shared SQL string, valid verbatim in both dialects, so
# the correctly-rounded double expression TREES are identical (q_ab_test
# precedent). Every operand is CAST to DOUBLE explicitly: DuckDB's bare
# `1.0` literal is DECIMAL(2,1) and decimal division rounds differently
# than IEEE double division (last-ulp divergence observed without casts).
_WELCH_T_EXPR = (
    "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    " / SQRT(CAST(n1 * q1 - s1 * s1 AS DOUBLE)"
    "        / CAST(n1 * (n1 - 1) AS DOUBLE) / CAST(n1 AS DOUBLE)"
    "      + CAST(n0 * q0 - s0 * s0 AS DOUBLE)"
    "        / CAST(n0 * (n0 - 1) AS DOUBLE) / CAST(n0 AS DOUBLE))"
)

_WELCH_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT) AS s0,
               CAST(SUM(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END)
                    AS BIGINT) AS q0,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
               CAST(SUM(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END)
                    AS BIGINT) AS q1
        FROM per_user
    )
    SELECT n0, s0, q0, n1, s1, q1,
           {_WELCH_T_EXPR} AS t_stat,
           CAST(CASE WHEN ABS({_WELCH_T_EXPR}) > 1.96 THEN 1 ELSE 0 END
                AS BIGINT) AS significant
    FROM arms
"""


@declared("q_welch_ttest", oracle=_WELCH_ORACLE)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on per-user total spend (cents),
    arms split by user_id parity — the continuous-outcome counterpart of
    q_ab_test's two-proportion z: the experiment readout for revenue-like
    metrics where a conversion flag throws information away. One row:
    both arms' exact integer moments (n, sum, sum-of-squares), the t
    statistic, and the |t| > 1.96 call.

    Engine-exactness: the moments are exact BIGINTs (cents via the house
    ROUND(value*100) quantization); the t chain is ONE shared SQL string
    evaluated verbatim by both engines — chained correctly-rounded double
    divisions over identical integers plus the IEEE-exact sqrt — so the
    double is bit-equal without rounding (q_ab_test precedent,
    scalepatterns.py). Sample variance uses the cleared form
    (n·Σx² − (Σx)²)/(n·(n−1)), no float mean ever materialized.

    Scale notes (100 TB): one map-side-combined per-user aggregate, one
    6-number global aggregate, zero joins — the cheapest possible
    experiment rollup; the same two-level shape q_grpo_advantage uses per
    group, here collapsed to a single experiment row."""
    t = load_tables(spark, sf_dir)
    per_user = t.events.groupBy("user_id").agg(
        F.expr("CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)").alias(
            "cents"
        )
    ).select((F.col("user_id") % 2).cast("bigint").alias("arm"), "cents")
    arms = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("s0"),
        F.sum(
            F.when(F.col("arm") == 0, F.col("cents") * F.col("cents")).otherwise(0)
        )
        .cast("bigint")
        .alias("q0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("cents") * F.col("cents")).otherwise(0)
        )
        .cast("bigint")
        .alias("q1"),
    )
    return arms.select(
        "n0", "s0", "q0", "n1", "s1", "q1",
        F.expr(_WELCH_T_EXPR).alias("t_stat"),
        F.expr(
            f"CAST(CASE WHEN ABS({_WELCH_T_EXPR}) > 1.96 THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("significant"),
    )


# --------------------------------------------------------------------------
# CUSUM change detection (prefix-min closed form, per event type)
# --------------------------------------------------------------------------

CUSUM_K_CENTS = 6_000  # drift allowance per observation (just above mean)
CUSUM_H_CENTS = 50_000  # alarm threshold on the CUSUM statistic

_CUSUM_ORACLE = f"""
    WITH ev AS (
        SELECT event_type, ts, event_id,
               CAST(ROUND(value * 100) AS BIGINT) - {CUSUM_K_CENTS} AS x
        FROM events
    ), pre1 AS (
        SELECT event_type, ts, event_id,
               SUM(x) OVER (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS p
        FROM ev
    ), pre AS (
        SELECT event_type, event_id, p,
               MIN(p) OVER (PARTITION BY event_type ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS floor_p
        FROM pre1
    ), s AS (
        SELECT event_type, event_id,
               CAST(p - LEAST(floor_p, 0) AS BIGINT) AS cusum
        FROM pre
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(cusum) AS BIGINT) AS max_cusum,
           CAST(MIN(event_id) FILTER (WHERE cusum = (
               SELECT MAX(s2.cusum) FROM s s2
               WHERE s2.event_type = s.event_type)) AS BIGINT) AS at_event_id,
           CAST(CASE WHEN MAX(cusum) > {CUSUM_H_CENTS} THEN 1 ELSE 0 END
                AS BIGINT) AS alarm
    FROM s GROUP BY event_type ORDER BY event_type
"""


@declared("q_cusum", oracle=_CUSUM_ORACLE)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change detection (Page 1954) per event type over the
    (ts, event_id)-ordered value stream: the classic sequential drift
    alarm S_i = max(0, S_{{i-1}} + x_i - k), computed NOT as a recursion
    but via its prefix-min closed form S_i = P_i - min(0, min_{{j<=i}}
    P_j) with P = running sum of (x - k) — which turns an inherently
    sequential statistic into two stacked partitioned window passes, the
    form that actually distributes. Per type: the maximum CUSUM
    excursion, the event where it peaked (ties -> smallest event_id), and
    the alarm against CUSUM_H_CENTS — the monitoring readout an ingest
    pipeline keeps per source/type to catch value-scale regressions.

    Engine-exactness: all arithmetic is BIGINT cents (the house
    ROUND(value*100) quantization); both windows run over the
    (ts, event_id) total order; the argmax is MIN(event_id) at the
    maximum, a total order.

    Scale notes (100 TB): two windows share ONE partitioning (event_type)
    and one sort key — Spark plans a single sort + window stage per
    partition-group (cf. q_funnel's stacked-window shape); no global
    window, no join; the final rollup is |event types| rows. Per-key
    streams at 100 TB would partition by (type, day) and stitch boundary
    state, the standard sessionization split."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    ev = t.events.select(
        "event_type",
        "ts",
        "event_id",
        (
            F.expr("CAST(ROUND(value * 100) AS BIGINT)") - CUSUM_K_CENTS
        ).alias("x"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = ev.select(
        "event_type", "ts", "event_id", F.sum("x").over(w).alias("p")
    ).withColumn("floor_p", F.min("p").over(w))
    s = pre.select(
        "event_type",
        "event_id",
        (F.col("p") - F.least(F.col("floor_p"), F.lit(0)))
        .cast("bigint")
        .alias("cusum"),
    )
    return (
        s.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.max("cusum").cast("bigint").alias("max_cusum"),
            F.min_by(
                "event_id", F.struct((-F.col("cusum")).alias("nc"), "event_id")
            )
            .cast("bigint")
            .alias("at_event_id"),
            F.expr(
                f"CAST(CASE WHEN MAX(cusum) > {CUSUM_H_CENTS} THEN 1 ELSE 0 END"
                " AS BIGINT)"
            ).alias("alarm"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Benford first-digit forensics over event values (data-quality audit)
# --------------------------------------------------------------------------

# log10(1 + 1/d) in basis points — the integer Benford table; the nine
# entries sum to EXACTLY 10000, so the bp-space comparison is closed
BENFORD_BP = [3010, 1761, 1249, 969, 792, 669, 580, 512, 458]

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {bp}" for d, bp in enumerate(BENFORD_BP, start=1)
)

_BENFORD_ORACLE = f"""
    WITH cents AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
        WHERE CAST(ROUND(value * 100) AS BIGINT) > 0
    ), dig AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM cents
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM dig
    )
    SELECT d.digit,
           CAST(COUNT(dig.digit) AS BIGINT) AS n,
           CAST(COUNT(dig.digit) * 10000 // n.n_all AS BIGINT) AS obs_bp,
           CAST(CASE d.digit {_BENFORD_CASE} END AS BIGINT) AS benford_bp,
           CAST(ABS(COUNT(dig.digit) * 10000 // n.n_all
                    - CASE d.digit {_BENFORD_CASE} END) AS BIGINT) AS dev_bp
    FROM (SELECT unnest(range(1, 10)) AS digit) d
    LEFT JOIN dig ON dig.digit = d.digit
    CROSS JOIN n
    GROUP BY d.digit, n.n_all ORDER BY d.digit
"""


@declared("q_benford", oracle=_BENFORD_ORACLE)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of event values (cents): the forensic
    data-quality check that flags fabricated or unit-mangled numeric
    columns — organic multi-scale amounts follow log10(1 + 1/d); uniform
    or clipped generators do not. Per digit 1-9: observed count, observed
    share in basis points, the Benford expectation (an INTEGER table —
    the nine bp entries sum to exactly 10000, so the comparison lives
    entirely in integer bp space), and the absolute deviation. The
    testdata's value generator turns out to be near-Benford (multi-scale
    amounts), so the audit reads quiet — a clipped or uniform regression
    would light up digits 1-2.

    Engine-exactness: first digit via string head of the positive BIGINT
    cents (identical in both engines); shares are one floor division of
    non-negatives; the expectation is a CASE literal; digit is a total
    order. The left join against the 9-digit spine keeps absent digits
    present with n = 0.

    Scale notes (100 TB): one map (quantize + first digit) feeding a
    9-group map-side-combined count — the cheapest possible full-column
    audit; the 9-row spine join is a broadcast of a constant."""
    t = load_tables(spark, sf_dir)
    dig = (
        t.events.select(F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"))
        .filter(F.col("c") > 0)
        .select(
            F.expr("CAST(substr(CAST(c AS STRING), 1, 1) AS BIGINT)").alias("digit")
        )
    )
    dig.persist()  # the count-by-digit and the total share it
    n = dig.agg(F.count("*").cast("bigint").alias("n_all"))
    counts = dig.groupBy("digit").agg(F.count("*").cast("bigint").alias("n"))
    spine = spark.range(1, 10).select(F.col("id").alias("digit"))
    return (
        spine
        .join(counts, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.expr(
                "CAST(COALESCE(n, 0) * 10000 div n_all AS BIGINT)"
            ).alias("obs_bp"),
            F.expr(f"CAST(CASE digit {_BENFORD_CASE} END AS BIGINT)").alias(
                "benford_bp"
            ),
            F.expr(
                f"CAST(ABS(COALESCE(n, 0) * 10000 div n_all"
                f" - CASE digit {_BENFORD_CASE} END) AS BIGINT)"
            ).alias("dev_bp"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------------
# Chi-square independence audit (lang x source contingency, integer-exact)
# --------------------------------------------------------------------------

CHI2_N_MAX = 40_000  # int64 safety: (N^2)^2 <= 2.56e18 < 2^63


def _chi2_guarded_n(duck: bool) -> str:
    if duck:
        return f"""
        SELECT CAST(COUNT(*) AS BIGINT)
               + COALESCE(CASE WHEN COUNT(*) > {CHI2_N_MAX}
                   THEN CAST(error('q_chi2_independence: row count exceeds the int64-safe bound') AS BIGINT)
                 END, 0) AS n
        FROM documents
    """
    return ""


_CHI2_ORACLE = f"""
    WITH o AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
        FROM documents GROUP BY lang, source
    ), r AS (
        SELECT lang, CAST(SUM(obs) AS BIGINT) AS rt FROM o GROUP BY lang
    ), c AS (
        SELECT source, CAST(SUM(obs) AS BIGINT) AS ct FROM o GROUP BY source
    ), n AS ({_chi2_guarded_n(True)}
    ), grid AS (
        SELECT r.lang, c.source, r.rt, c.ct FROM r CROSS JOIN c
    )
    SELECT g.lang, g.source,
           CAST(COALESCE(o.obs, 0) AS BIGINT) AS obs,
           CAST(g.rt * g.ct AS BIGINT) AS exp_num,
           CAST((COALESCE(o.obs, 0) * n.n - g.rt * g.ct)
                * (COALESCE(o.obs, 0) * n.n - g.rt * g.ct)
                // (g.rt * g.ct) AS BIGINT) AS chi2_n_contrib
    FROM grid g
    LEFT JOIN o ON o.lang = g.lang AND o.source = g.source
    CROSS JOIN n
    ORDER BY g.lang, g.source
"""


@declared("q_chi2_independence", oracle=_CHI2_ORACLE)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit of the lang x source contingency
    table — the curation check for whether sources are language-skewed
    (a skewed mixture silently shifts the per-language data budget). Per
    cell: observed count, expected numerator R·C (expected x N), and the
    integer contribution (O·N − R·C)² // (R·C) — which is chi-square_cell
    x N, so the full statistic is sum(contrib)/N with per-cell floors as
    the spec. Absent (lang, source) combinations appear with obs = 0 via
    the row x column spine.

    Engine-exactness: pure integer cross-multiplication (no float
    expected counts ever materialized); one floor division of
    non-negatives per cell (the numerator is a square); the int64 bound
    N <= CHI2_N_MAX ((N²)² < 2^63) is ENFORCED in-plan on both engines
    (assert_true / error(), the q_embed_cov pattern) through the output
    column; (lang, source) is a total order.

    Scale notes (100 TB): one map-side-combined groupBy over the corpus,
    then everything runs on the |langs| x |sources| grid (broadcast
    joins); at a larger N, divide O·N − R·C by N first (losing the exact
    square) or widen to DECIMAL — the bound fails fast either way."""
    t = load_tables(spark, sf_dir)
    o = t.documents.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("obs")
    )
    o.persist()  # row totals, column totals, N, and the spine join share it
    r = o.groupBy("lang").agg(F.sum("obs").cast("bigint").alias("rt"))
    c = o.groupBy("source").agg(F.sum("obs").cast("bigint").alias("ct"))
    n = o.agg(
        (
            F.sum("obs").cast("bigint")
            + F.coalesce(
                F.assert_true(
                    F.sum("obs") <= CHI2_N_MAX,
                    "q_chi2_independence: row count exceeds the int64-safe bound",
                ).cast("bigint"),
                F.lit(0),
            )
        ).alias("n")
    )
    grid = r.crossJoin(F.broadcast(c))
    return (
        grid.join(o, ["lang", "source"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            F.coalesce("obs", F.lit(0)).cast("bigint").alias("obs"),
            (F.col("rt") * F.col("ct")).cast("bigint").alias("exp_num"),
            F.expr(
                "CAST((COALESCE(obs, 0) * n - rt * ct)"
                " * (COALESCE(obs, 0) * n - rt * ct)"
                " div (rt * ct) AS BIGINT)"
            ).alias("chi2_n_contrib"),
        )
        .orderBy("lang", "source")
    )
