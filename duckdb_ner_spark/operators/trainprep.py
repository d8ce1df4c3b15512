"""Training-data preparation operators (task Tier-D extension): distinct-count
sketching, document chunking, repetition-based quality filtering, PII-style
redaction. These are the remaining prep stages a 100 TB pretraining pipeline
runs between raw ingest and tokenization, beyond dedup (operators/dedup.py),
quality/lang-ID (operators/textstats.py) and similarity (operators/similarity.py).

All four queries are JVM-side built-ins only (split / slice / sequence /
regexp_replace / TakeOrdered) — no Python UDFs — and every one is
hash-verified against a DuckDB replay of the identical construction
(md5-based hashing keeps the sketch engine-portable, the same trick as
q_dedup_near / q_dedup_simhash).

Scale notes (100 TB):
- KMV sketch: per-partition top-k mins (TakeOrderedAndProject — no wide
  shuffle of raw rows; only k-sized partials merge at the driver-free final
  stage). The sketch is mergeable: union two KMVs = merge + re-truncate to k,
  which is how per-partition / per-day sketches roll up.
- chunking: narrow per-row explode — embarrassingly parallel, output
  partitioning inherits the input's doc_id distribution.
- repetition filter: explode + two-level count/count-distinct keyed by
  doc_id; bucketing documents by doc_id makes it co-located at scale.
- redaction: pure narrow projection (regexp_replace is codegen'd) — zero
  shuffle until the final small aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import declared
from ..sources.catalog import load_tables

# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — engine-portable approx distinct
# --------------------------------------------------------------------------

KMV_K = 256
# the k smallest raw hashes may contain duplicate keys (same key ⇒ same md5);
# take OVERSAMPLE×k raw mins first, dedup, re-truncate. lineitem averages ~4
# rows per l_orderkey, so 8× leaves >2× headroom of distinct hashes.
KMV_OVERSAMPLE = 8

_KMV_ORACLE = f"""
    WITH h AS (
        SELECT md5('kmv|' || CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem
    ), raw_mins AS (
        SELECT h FROM h ORDER BY h LIMIT {KMV_K * KMV_OVERSAMPLE}
    ), dk AS (
        SELECT DISTINCT h FROM raw_mins ORDER BY h LIMIT {KMV_K}
    ), kth AS (
        SELECT MAX(h) AS kth_hash, COUNT(*) AS k FROM dk
    ), v AS (
        -- value of the 15-hex-char prefix as a 60-bit integer
        SELECT kth.kth_hash, kth.k,
               (SELECT SUM(CAST(strpos('0123456789abcdef', substr(kth.kth_hash, CAST(i AS INT), 1)) - 1 AS BIGINT)
                           << CAST((15 - i) * 4 AS INT))
                FROM range(1, 16) t(i)) AS hv
        FROM kth
    ), ex AS (
        SELECT COUNT(DISTINCT l_orderkey) AS exact_distinct FROM lineitem
    )
    SELECT CAST(v.k AS BIGINT) AS k,
           v.kth_hash,
           CAST(ROUND((CAST(v.k AS DOUBLE) - 1) * 1152921504606846976 / CAST(v.hv AS DOUBLE)
                      * 100) AS BIGINT) AS est_fx,
           ex.exact_distinct,
           CAST(ROUND(ABS((CAST(v.k AS DOUBLE) - 1) * 1152921504606846976 / CAST(v.hv AS DOUBLE)
                          - ex.exact_distinct) / ex.exact_distinct * 10000) AS BIGINT)
               AS rel_err_fx
    FROM v, ex
"""


@declared("q_kmv_distinct", oracle=_KMV_ORACLE)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch over l_orderkey, hash-verified end to end.

    Complements q_approx_distinct (Spark's native HLL — engine-local, so
    rows-only): KMV over md5 is engine-portable, so the DuckDB oracle replays
    the sketch bit-for-bit — kth hash, estimate, and relative error all
    hash-match. Estimator: (k-1) / frac(kth min hash), frac over the 60-bit
    hex prefix (2^60 = 1152921504606846976). Both TakeOrdered stages are
    per-partition heaps — raw rows never shuffle.

    Engine-exactness: estimate and rel-error are reported in 1e2/1e4 FIXED
    POINT (scale-then-round-to-integer), never ROUND(double, n>0): Spark
    rounds the double's shortest decimal repr (BigDecimal HALF_UP) while
    DuckDB rounds the binary value — integer rounding after scaling can't
    diverge because a double whose shortest repr ends in .5 IS exactly .5
    (same conversion as q_kmv_join_est's est_*_fx, r5 code-review class)."""
    t = load_tables(spark, sf_dir)
    h = t.lineitem.select(
        F.md5(F.concat(F.lit("kmv|"), F.col("l_orderkey").cast("string"))).alias("h")
    )
    dk = (
        h.orderBy("h")
        .limit(KMV_K * KMV_OVERSAMPLE)
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
    )
    kth = dk.agg(F.max("h").alias("kth_hash"), F.count("*").alias("k"))
    # conv() parses the 15-hex-char prefix (60 bits — no sign/overflow risk)
    hv = F.conv(F.substring("kth_hash", 1, 15), 16, 10).cast("bigint")
    est = (F.col("k").cast("double") - 1) * F.lit(float(1 << 60)) / hv.cast("double")
    exact = t.lineitem.agg(
        F.countDistinct("l_orderkey").alias("exact_distinct")
    )
    return (
        kth.crossJoin(exact)
        .select(
            F.col("k").cast("bigint").alias("k"),
            "kth_hash",
            F.round(est * 100).cast("bigint").alias("est_fx"),
            "exact_distinct",
            F.round(
                F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct") * 10000
            )
            .cast("bigint")
            .alias("rel_err_fx"),
        )
    )


# --------------------------------------------------------------------------
# Document chunking (training-sample windowing with overlap)
# --------------------------------------------------------------------------

CHUNK_WORDS = 50
CHUNK_STRIDE = 40  # = 50 - 10 words of overlap

_CHUNK_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), starts AS (
        SELECT doc_id, ws, CAST(s AS BIGINT) AS s
        FROM d, unnest(range(1, GREATEST(LEN(ws), 1) + 1, {CHUNK_STRIDE})) t(s)
    )
    SELECT doc_id,
           CAST((s - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(LEN(list_slice(ws, CAST(s AS INT), LEAST(CAST(s AS INT) + {CHUNK_WORDS - 1}, LEN(ws)))) AS BIGINT)
               AS n_words,
           md5(array_to_string(list_slice(ws, CAST(s AS INT), LEAST(CAST(s AS INT) + {CHUNK_WORDS - 1}, LEN(ws))), ' '))
               AS chunk_md5
    FROM starts
"""


@declared("q_chunk", oracle=_CHUNK_ORACLE)
def q_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunking: 50-word chunks, 40-word stride
    (10-word overlap) — the standard pretraining-sample windowing. Chunks are
    emitted as (doc_id, chunk_id, n_words, md5(chunk_text)): the md5 keeps
    the verified result compact while still pinning the exact chunk content.
    Narrow explode, no shuffle — at 100 TB this is a pure map stage."""
    t = load_tables(spark, sf_dir)
    ws = F.split(F.col("text"), " ")
    d = t.documents.select("doc_id", ws.alias("ws"))
    # sequence() is DESCENDING when start > stop, so clamp the stop at 1
    starts = d.select(
        "doc_id",
        "ws",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("ws"), F.lit(1)), F.lit(CHUNK_STRIDE))
        ).alias("s"),
    )
    chunk = F.slice(F.col("ws"), F.col("s"), CHUNK_WORDS)
    return starts.select(
        "doc_id",
        ((F.col("s") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_words"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


# --------------------------------------------------------------------------
# Repetition-ratio quality filter (duplicate-2-gram share per document)
# --------------------------------------------------------------------------

REP_FLAG_THRESHOLD = 0.5

_REPETITION_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), grams AS (
        SELECT doc_id, ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1] AS g
        FROM d, unnest(range(1, GREATEST(LEN(ws), 1))) t(i)
    ), agg AS (
        SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT g) AS n_distinct
        FROM grams GROUP BY doc_id
    )
    SELECT doc_id,
           n_grams,
           n_distinct,
           ROUND(1 - CAST(n_distinct AS DOUBLE) / n_grams, 6) AS rep_ratio,
           (1 - CAST(n_distinct AS DOUBLE) / n_grams) > {REP_FLAG_THRESHOLD} AS flagged
    FROM agg
"""


@declared("q_repetition", oracle=_REPETITION_ORACLE)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal: share of duplicate word
    2-grams per document; documents above the threshold get flagged for
    drop. The ratio is a single division of two exact counts — bit-identical
    across engines, so the 6dp rounding is hash-safe. Two-level aggregate
    keyed by doc_id; single-word docs produce no 2-grams and drop out on
    both sides identically."""
    t = load_tables(spark, sf_dir)
    ws = F.split(F.col("text"), " ")
    d = t.documents.select("doc_id", ws.alias("ws"))
    # 2-grams as zip_with of two shifted slices — NOT element_at inside a
    # transform lambda, which would re-inline the split() per array access
    # (see textprep.shingles_expr). Docs with <2 words must yield an EMPTY
    # array (slice with negative length misbehaves), hence the guard.
    sz = F.size("ws")
    grams_arr = F.when(
        sz >= 2,
        F.zip_with(
            F.slice(F.col("ws"), 1, sz - 1),
            F.slice(F.col("ws"), 2, sz - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select("doc_id", F.explode(grams_arr).alias("g"))
    agg = grams.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"), F.countDistinct("g").alias("n_distinct")
    )
    ratio = F.lit(1) - F.col("n_distinct").cast("double") / F.col("n_grams")
    return agg.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.round(ratio, 6).alias("rep_ratio"),
        (ratio > REP_FLAG_THRESHOLD).alias("flagged"),
    )


# --------------------------------------------------------------------------
# PII-style redaction (numeric-literal scrub over semi-structured payloads)
# --------------------------------------------------------------------------

_SCRUB_ORACLE = """
    WITH r AS (
        SELECT event_type,
               LENGTH(props) AS len_raw,
               LENGTH(regexp_replace(props, '[0-9]+', '#', 'g')) AS len_marked,
               LENGTH(regexp_replace(props, '[0-9]+', '', 'g')) AS len_stripped
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(len_marked - len_stripped) AS BIGINT) AS total_redactions,
           CAST(SUM(len_raw - len_stripped) AS BIGINT) AS total_chars_removed
    FROM r
    GROUP BY event_type
"""


@declared("q_pii_scrub", oracle=_SCRUB_ORACLE)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-literal redaction over the events.props payloads — the
    PII-scrub pattern (emails / phone numbers / ids → placeholder tokens)
    with a digit-run pattern, since the synthetic corpus carries numbers in
    its JSON props. Occurrences counted engine-portably as
    len(replace-with-#) − len(replace-with-'') (one residual char per
    match). regexp_replace is a codegen'd narrow projection: zero shuffle
    before the final per-type aggregate, so the scrub runs at scan speed at
    100 TB. Spark's regexp_replace is global by default = DuckDB's 'g'."""
    t = load_tables(spark, sf_dir)
    marked = F.length(F.regexp_replace("props", "[0-9]+", "#"))
    stripped = F.length(F.regexp_replace("props", "[0-9]+", ""))
    raw = F.length("props")
    return (
        t.events.select(
            "event_type",
            (marked - stripped).alias("redactions"),
            (raw - stripped).alias("chars_removed"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("redactions").alias("total_redactions"),
            F.sum("chars_removed").alias("total_chars_removed"),
        )
    )


# --------------------------------------------------------------------------
# Single-pass data-quality audit (the validation gate before training prep)
# --------------------------------------------------------------------------

_DQ_ORACLE = """
    WITH row_checks AS (
        SELECT COUNT(*) AS n_checked,
               SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_custkey,
               SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpositive_price,
               SUM(CASE WHEN o_orderdate > TIMESTAMP '1998-08-02' THEN 1 ELSE 0 END)
                   AS future_orderdate
        FROM orders
    ), fk AS (
        SELECT COUNT(*) AS orphan_custkey
        FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT u.constraint_name, CAST(u.n_violations AS BIGINT) AS n_violations, r.n_checked
    FROM row_checks r, fk, LATERAL (
        SELECT * FROM (VALUES
            ('null_custkey', r.null_custkey),
            ('nonpositive_price', r.nonpositive_price),
            ('future_orderdate', r.future_orderdate),
            ('orphan_custkey', fk.orphan_custkey)
        ) v(constraint_name, n_violations)) u
"""


@declared("q_dq_audit", oracle=_DQ_ORACLE)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit in ONE pass: all row-level constraints (null keys,
    non-positive prices, out-of-range dates) are conditional sums inside a
    single scan-aggregate; the referential check (orders whose customer is
    missing) is one anti-join. At 100 TB this is the shape that matters — a
    per-constraint scan would multiply the read cost by the constraint count.
    The tiny (constraint, count) result unpivots via stack()."""
    t = load_tables(spark, sf_dir)
    row_checks = t.orders.agg(
        F.count("*").alias("n_checked"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_custkey"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpositive_price"),
        F.sum(
            F.when(F.col("o_orderdate") > F.lit("1998-08-02").cast("timestamp"), 1).otherwise(0)
        ).alias("future_orderdate"),
    )
    orphans = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey, "left_anti"
        ).agg(F.count("*").alias("orphan_custkey"))
    )
    wide = row_checks.crossJoin(orphans)
    return wide.select(
        F.expr(
            "stack(4,"
            " 'null_custkey', null_custkey,"
            " 'nonpositive_price', nonpositive_price,"
            " 'future_orderdate', future_orderdate,"
            " 'orphan_custkey', orphan_custkey)"
        ).alias("constraint_name", "n_violations"),
        "n_checked",
    )


# --------------------------------------------------------------------------
# Equi-width histogram (integer-exact bucket arithmetic)
# --------------------------------------------------------------------------

HIST_WIDTH_CENTS = 50_000  # 500.00-wide buckets over o_totalprice

_HIST_ORACLE = f"""
    WITH b AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   // {HIST_WIDTH_CENTS} AS bucket_id
        FROM orders
    ), h AS (
        SELECT bucket_id, COUNT(*) AS n FROM b GROUP BY bucket_id
    )
    SELECT bucket_id,
           CAST(bucket_id * {HIST_WIDTH_CENTS} AS DOUBLE) / 100 AS bucket_lo,
           n,
           CAST(SUM(n) OVER (ORDER BY bucket_id) AS BIGINT) AS cum_n
    FROM h
"""


@declared("q_histogram", oracle=_HIST_ORACLE)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram with a cumulative curve: bucket assignment runs
    on exact integer cents (decimal ×100 → BIGINT floor-div), so bucket
    membership can never straddle a float boundary differently per engine.
    One aggregation + one tiny window over the bucket list — the standard
    distribution-profiling query a pipeline runs before choosing filter
    thresholds."""
    t = load_tables(spark, sf_dir)
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    b = t.orders.select((cents / HIST_WIDTH_CENTS).cast("bigint").alias("bucket_id"))
    h = b.groupBy("bucket_id").agg(F.count("*").alias("n"))
    from pyspark.sql.window import Window

    w = Window.orderBy("bucket_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return h.select(
        "bucket_id",
        (F.col("bucket_id") * HIST_WIDTH_CENTS / 100).cast("double").alias("bucket_lo"),
        "n",
        F.sum("n").over(w).alias("cum_n"),
    )


# --------------------------------------------------------------------------
# Spark 4 Python UDTF surface: the chunker as a table function
# --------------------------------------------------------------------------


@declared("q_udtf_chunk", oracle=_CHUNK_ORACLE, cache_plan=False)
def q_udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The overlapping-window chunker expressed as a Spark 4 Python UDTF in
    a LATERAL join — same semantics and SAME oracle as q_chunk, which stays
    the production (built-in, codegen'd) path. This query exists to put the
    UDTF API surface itself through the hash gate: per-row fan-out, typed
    output schema, lateral correlation. UDTFs are row-at-a-time Python (the
    documented slow path) — acceptable here because chunk hashing is one
    md5 per ~50 words, not per row of a hot relational query."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id BIGINT, chunk_id BIGINT, n_words BIGINT, chunk_md5 STRING")
    class ChunkEmitter:
        def eval(self, doc_id: int, text: str):
            import hashlib

            ws = text.split(" ")
            for s in range(0, max(len(ws), 1), CHUNK_STRIDE):
                chunk = ws[s : s + CHUNK_WORDS]
                yield (
                    doc_id,
                    s // CHUNK_STRIDE,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    spark.udtf.register("dns_chunk_udtf", ChunkEmitter)
    t = load_tables(spark, sf_dir)
    t.documents.createOrReplaceTempView("dns_udtf_docs")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_id, c.n_words, c.chunk_md5 "
        "FROM dns_udtf_docs, LATERAL dns_chunk_udtf(doc_id, text) c"
    )


# --------------------------------------------------------------------------
# Benchmark decontamination: n-gram overlap between an eval set and the
# training corpus — the standard pre-training hygiene step (flag training
# documents that contain any n-gram from the held-out benchmark).
# --------------------------------------------------------------------------

DECONTAM_N = 8  # 8-word shingles — the common contamination-check n-gram size
DECONTAM_EVAL_MOD = 89  # doc_id % 89 == 0 plays the role of the benchmark set

_DECONTAM_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id, {{shingles}} AS gs FROM d
    ), eval_g AS (
        SELECT DISTINCT g
        FROM sh, unnest(gs) t(g)
        WHERE doc_id % {DECONTAM_EVAL_MOD} = 0
    ), train_g AS (
        SELECT doc_id, g
        FROM sh, unnest(gs) t(g)
        WHERE doc_id % {DECONTAM_EVAL_MOD} <> 0
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_contaminated_ngrams,
           MIN(t.g) AS first_ngram
    FROM train_g t JOIN eval_g e ON t.g = e.g
    GROUP BY t.doc_id
    ORDER BY n_contaminated_ngrams DESC, t.doc_id
"""

from .textprep import sql_shingles as _sql_shingles  # noqa: E402

_DECONTAM_ORACLE_SQL = _DECONTAM_ORACLE.format(shingles=_sql_shingles(DECONTAM_N))


@declared("q_decontam", oracle=_DECONTAM_ORACLE_SQL)
def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination sweep: every training document that shares
    at least one 8-word shingle with the eval set, with the overlap count
    and a deterministic example n-gram (MIN — order-independent).

    Scale notes (100 TB): the eval/benchmark side is small by construction
    (a benchmark is thousands of documents, not billions) — its distinct
    n-gram set is broadcast, so the training corpus is scanned once, never
    shuffled before the per-doc aggregate; the explode is narrow. Per-doc
    shingles are distinct (shingles_expr), so COUNT(*) after the join counts
    distinct contaminated n-grams without a count-distinct shuffle."""
    from .textprep import shingles_expr, words_col

    t = load_tables(spark, sf_dir)
    sh = t.documents.select(
        "doc_id", words_col("text").alias("ws")
    ).select("doc_id", shingles_expr("ws", DECONTAM_N).alias("gs"))
    eval_g = (
        sh.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0)
        .select(F.explode("gs").alias("g"))
        .distinct()
    )
    train_g = sh.filter(F.col("doc_id") % DECONTAM_EVAL_MOD != 0).select(
        "doc_id", F.explode("gs").alias("g")
    )
    return (
        train_g.join(F.broadcast(eval_g), "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_contaminated_ngrams"),
            F.min("g").alias("first_ngram"),
        )
        .orderBy(F.col("n_contaminated_ngrams").desc(), "doc_id")
    )


# --------------------------------------------------------------------------
# Sequence packing (offset-based): assign documents to fixed-size token
# windows for training-loader sharding.
# --------------------------------------------------------------------------

PACK_CAP = 2048  # context-window token budget

_PACK_ORACLE = f"""
    WITH d AS (
        SELECT source, doc_id, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), c AS (
        SELECT source, doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum_tokens
        FROM d
    )
    SELECT source, doc_id, n_tokens,
           CAST(cum_tokens - n_tokens AS BIGINT) AS stream_offset,
           CAST((cum_tokens - 1) // {PACK_CAP} AS BIGINT) AS window_id
    FROM c
    ORDER BY source, doc_id
"""


@declared("q_pack", oracle=_PACK_ORACLE)
def q_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-based sequence packing: per source shard, documents in doc_id
    order form one token stream; each document is assigned the fixed-size
    context window its END token falls into, plus its stream offset — the
    assignment a training data-loader consumes. Window token counts are an
    aggregation away (grouped by (source, window_id)).

    Offset packing (vs first-fit bin packing) is the scalable variant: the
    exact greedy packers are sequential scans, while this is one window
    function per shard — at 100 TB the PARTITION BY source keys the shuffle
    and each shard's prefix sum is independent. Uses word count as the token
    proxy (same proxy as q_token_count's whitespace tokenizer)."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    d = t.documents.select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return c.select(
        "source",
        "doc_id",
        "n_tokens",
        (F.col("cum_tokens") - F.col("n_tokens")).cast("bigint").alias("stream_offset"),
        F.expr(f"(cum_tokens - 1) div {PACK_CAP}").cast("bigint").alias("window_id"),
    ).orderBy("source", "doc_id")


# --------------------------------------------------------------------------
# KMV sketch MERGEABILITY (the property that makes sketches cluster-safe)
# --------------------------------------------------------------------------


_KMV_MERGE_ORACLE = f"""
    WITH h AS (
        SELECT source, md5('kmvm|' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ), per_src AS (
        SELECT source, h FROM (
            SELECT source, h,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM (SELECT DISTINCT source, h FROM h)
        ) WHERE rn <= {KMV_K}
    ), merged AS (
        SELECT h FROM (
            SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
            FROM (SELECT DISTINCT h FROM per_src)
        ) WHERE rn <= {KMV_K}
    ), direct AS (
        SELECT h FROM (
            SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
            FROM (SELECT DISTINCT h FROM h)
        ) WHERE rn <= {KMV_K}
    ), m AS (
        SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS k FROM merged
    ), d AS (
        SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS k FROM direct
    ), mv AS (
        -- 15-hex-char prefix as a 60-bit integer (the q_kmv_distinct idiom)
        SELECT m.kth, m.k,
               (SELECT SUM(CAST(strpos('0123456789abcdef', substr(m.kth, CAST(i AS INT), 1)) - 1 AS BIGINT)
                           << CAST((15 - i) * 4 AS INT))
                FROM range(1, 16) t(i)) AS hv
        FROM m
    )
    SELECT CAST((SELECT COUNT(*) FROM per_src) AS BIGINT) AS n_sketch_rows,
           mv.k AS k,
           mv.kth AS merged_kth,
           d.kth AS direct_kth,
           CAST(CASE WHEN mv.kth = d.kth AND mv.k = d.k THEN 1 ELSE 0 END
                AS BIGINT) AS sketches_agree,
           (CAST(mv.k AS DOUBLE) - 1) * 1152921504606846976
               / CAST(mv.hv AS DOUBLE) AS est_distinct
    FROM mv, d
"""


@declared("q_kmv_merge", oracle=_KMV_MERGE_ORACLE)
def q_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch MERGE proof: per-source k-minimum-values sketches, merged
    by taking the k smallest of the union, must equal the sketch built
    directly over the whole corpus — the mergeability property that lets a
    1000-executor cluster (or a day-partitioned pipeline) sketch shards
    independently and combine them without rescanning. The equality is
    computed IN THE PLAN (kth hash + cardinality compared), not assumed.

    Engine-exactness: md5 KMV is the q_kmv_distinct construction — hashes,
    kth selection, and the (k-1)/frac estimator replay bit-for-bit.

    Scale notes (100 TB): per-source sketches bound the shuffle to
    k rows/source (the window is PARTITIONED by source); the merge touches
    k·n_sources rows. This is exactly how a partitioned distinct-count
    rollup ships: sketch per partition, merge at read."""
    t = load_tables(spark, sf_dir)
    from pyspark.sql.window import Window

    h = t.documents.select(
        "source",
        F.md5(F.concat(F.lit("kmvm|"), F.col("doc_id").cast("string"))).alias("h"),
    ).distinct()
    wsrc = Window.partitionBy("source").orderBy("h")
    per_src = (
        h.withColumn("rn", F.row_number().over(wsrc))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    merged = per_src.select("h").distinct().orderBy("h").limit(KMV_K)
    direct = h.select("h").distinct().orderBy("h").limit(KMV_K)
    m = merged.agg(F.max("h").alias("merged_kth"), F.count("*").cast("bigint").alias("k"))
    d = direct.agg(F.max("h").alias("direct_kth"), F.count("*").cast("bigint").alias("dk"))
    n_rows = per_src.agg(F.count("*").cast("bigint").alias("n_sketch_rows"))
    hv = F.conv(F.substring("merged_kth", 1, 15), 16, 10).cast("bigint")
    return (
        n_rows.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(d))
        .select(
            "n_sketch_rows",
            "k",
            "merged_kth",
            "direct_kth",
            F.when(
                (F.col("merged_kth") == F.col("direct_kth")) & (F.col("k") == F.col("dk")), 1
            )
            .otherwise(0)
            .cast("bigint")
            .alias("sketches_agree"),
            (
                (F.col("k").cast("double") - 1)
                * F.lit(float(1 << 60))
                / hv.cast("double")
            ).alias("est_distinct"),
        )
    )


# --------------------------------------------------------------------------
# KMV join-size estimation (sketch algebra for the query planner)
# --------------------------------------------------------------------------

_KMV_JOIN_ORACLE = f"""
    WITH ha AS (
        SELECT DISTINCT md5('kmvj|' || CAST(o_custkey AS VARCHAR)) AS h FROM orders
    ), hb AS (
        SELECT DISTINCT md5('kmvj|' || CAST(c_custkey AS VARCHAR)) AS h FROM customer
    ), ka AS (
        SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM ha)
        WHERE rn <= {KMV_K}
    ), kb AS (
        SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM hb)
        WHERE rn <= {KMV_K}
    ), ku AS (
        SELECT h FROM (
            SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
            FROM (SELECT h FROM ka UNION SELECT h FROM kb)
        ) WHERE rn <= {KMV_K}
    ), ma AS (
        SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS k FROM ka
    ), mb AS (
        SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS k FROM kb
    ), mu AS (
        SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS k FROM ku
    ), est AS (
        SELECT
          (CAST(ma.k AS DOUBLE) - 1) * 1152921504606846976
            / CAST((SELECT SUM(CAST(strpos('0123456789abcdef', substr(ma.kth, CAST(i AS INT), 1)) - 1 AS BIGINT)
                                << CAST((15 - i) * 4 AS INT))
                    FROM range(1, 16) t(i)) AS DOUBLE) AS est_a,
          (CAST(mb.k AS DOUBLE) - 1) * 1152921504606846976
            / CAST((SELECT SUM(CAST(strpos('0123456789abcdef', substr(mb.kth, CAST(i AS INT), 1)) - 1 AS BIGINT)
                                << CAST((15 - i) * 4 AS INT))
                    FROM range(1, 16) t(i)) AS DOUBLE) AS est_b,
          (CAST(mu.k AS DOUBLE) - 1) * 1152921504606846976
            / CAST((SELECT SUM(CAST(strpos('0123456789abcdef', substr(mu.kth, CAST(i AS INT), 1)) - 1 AS BIGINT)
                                << CAST((15 - i) * 4 AS INT))
                    FROM range(1, 16) t(i)) AS DOUBLE) AS est_u
        FROM ma, mb, mu
    )
    SELECT CAST((SELECT COUNT(*) FROM ha) AS BIGINT) AS exact_a,
           CAST((SELECT COUNT(*) FROM hb) AS BIGINT) AS exact_b,
           CAST((SELECT COUNT(*) FROM ha JOIN hb USING (h)) AS BIGINT) AS exact_inter,
           CAST(ROUND(est.est_a * 100) AS BIGINT) AS est_a_fx,
           CAST(ROUND(est.est_b * 100) AS BIGINT) AS est_b_fx,
           CAST(ROUND((est.est_a + est.est_b - est.est_u) * 100) AS BIGINT)
               AS est_inter_fx
    FROM est
"""


@declared("q_kmv_join_est", oracle=_KMV_JOIN_ORACLE)
def q_kmv_join_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based JOIN-SIZE estimation: KMV sketches of orders.o_custkey
    and customer.c_custkey, union-merged (k smallest of the sketch union —
    the q_kmv_merge algebra), give |A∩B| ≈ est(A) + est(B) − est(A∪B) by
    inclusion-exclusion — the cardinality estimate a cost-based planner
    wants BEFORE committing a join strategy, from two k-row summaries
    instead of a scan. Exact counts computed alongside so the estimate's
    error is part of the verified result.

    Engine-exactness: md5 KMV replays bit-for-bit (the q_kmv_distinct
    idiom); estimators are fixed-order double expressions over exact
    integers, reported in 1e2 FIXED POINT (scale-then-round-to-integer).
    ROUND(double, 2) is banned here: Spark rounds the double's shortest
    decimal repr (BigDecimal HALF_UP — round(0.145, 2) = 0.15) while
    DuckDB rounds the binary value (0.14499… → 0.14); integer rounding
    after scaling cannot hit that class because a double whose shortest
    repr ends in .5 IS exactly .5 (r5 code-review finding).

    Scale notes (100 TB): each sketch is a per-partition k-min heap
    (TakeOrdered) over 32-byte digests; the merge and the estimate touch
    3k rows total. The exact-side joins exist only to score the estimate —
    a production planner runs just the sketch path."""
    t = load_tables(spark, sf_dir)

    def sketch(df, col, name):
        h = df.select(
            F.md5(F.concat(F.lit("kmvj|"), F.col(col).cast("string"))).alias("h")
        ).distinct()
        return h, h.orderBy("h").limit(KMV_K)

    ha, ka = sketch(t.orders, "o_custkey", "a")
    hb, kb = sketch(t.customer, "c_custkey", "b")
    ku = ka.unionByName(kb).distinct().orderBy("h").limit(KMV_K)

    def est(kdf, name):
        kth = kdf.agg(F.max("h").alias("kth"), F.count("*").alias("k"))
        hv = F.conv(F.substring("kth", 1, 15), 16, 10).cast("bigint")
        return kth.select(
            (
                (F.col("k").cast("double") - 1)
                * F.lit(float(1 << 60))
                / hv.cast("double")
            ).alias(name)
        )

    exact_a = ha.agg(F.count("*").cast("bigint").alias("exact_a"))
    exact_b = hb.agg(F.count("*").cast("bigint").alias("exact_b"))
    exact_i = ha.join(hb, "h").agg(F.count("*").cast("bigint").alias("exact_inter"))
    return (
        exact_a.crossJoin(F.broadcast(exact_b))
        .crossJoin(F.broadcast(exact_i))
        .crossJoin(F.broadcast(est(ka, "ea")))
        .crossJoin(F.broadcast(est(kb, "eb")))
        .crossJoin(F.broadcast(est(ku, "eu")))
        .select(
            "exact_a",
            "exact_b",
            "exact_inter",
            F.expr("CAST(ROUND(ea * 100) AS BIGINT)").alias("est_a_fx"),
            F.expr("CAST(ROUND(eb * 100) AS BIGINT)").alias("est_b_fx"),
            F.expr("CAST(ROUND((ea + eb - eu) * 100) AS BIGINT)").alias(
                "est_inter_fx"
            ),
        )
    )


# --------------------------------------------------------------------------
# Packing-efficiency table: padding waste per candidate context length
# --------------------------------------------------------------------------

PACK_EFF_LENGTHS = (128, 512, 2048)

_PACK_EFF_ORACLE = f"""
    WITH d AS (
        SELECT CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n FROM documents
    ), menu AS (
        SELECT unnest([{", ".join(str(x) for x in PACK_EFF_LENGTHS)}]) AS ctx
    )
    SELECT CAST(m.ctx AS BIGINT) AS ctx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n) AS BIGINT) AS tokens,
           CAST(SUM(((d.n + m.ctx - 1) // m.ctx) * m.ctx - d.n) AS BIGINT)
               AS pad_unpacked,
           CAST(((SUM(d.n) + m.ctx - 1) // m.ctx) * m.ctx - SUM(d.n) AS BIGINT)
               AS pad_packed,
           SUM(((d.n + m.ctx - 1) // m.ctx) * m.ctx - d.n) * 1e0
               / (SUM(d.n) + SUM(((d.n + m.ctx - 1) // m.ctx) * m.ctx - d.n))
               AS waste_unpacked_ratio
    FROM menu m CROSS JOIN d
    GROUP BY m.ctx
"""


@declared("q_pack_efficiency", oracle=_PACK_EFF_ORACLE)
def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency decision table: for each candidate context length,
    the padding the corpus pays WITHOUT sequence packing (each doc rounded
    up to whole contexts — the naive loader) vs WITH stream packing (q_pack's
    concatenated-stream model: only the final context is padded). The
    waste ratio is the compute fraction burned on pad tokens — the number
    that justifies the packing pipeline and picks the context length.

    Engine-exactness: pure integer ceil-division arithmetic
    ((n + ctx − 1) div ctx), BIGINT sums, one 1e0 division.

    Scale notes (100 TB): one corpus pass to per-doc token counts; the
    3-row menu cross-join is a broadcast; everything downstream is a
    combiner aggregate per menu row."""
    t = load_tables(spark, sf_dir)
    d = t.documents.select(
        F.size(F.split("text", " ")).cast("bigint").alias("n")
    )
    menu = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in PACK_EFF_LENGTHS])).alias("ctx")
    )
    pad_doc = F.expr("((n + ctx - 1) div ctx) * ctx - n")
    return (
        F.broadcast(menu)
        .crossJoin(d)
        .groupBy("ctx")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("tokens"),
            F.sum(pad_doc).cast("bigint").alias("pad_unpacked"),
            F.expr(
                "CAST(((SUM(n) + ctx - 1) div ctx) * ctx - SUM(n) AS BIGINT)"
            ).alias("pad_packed"),
            F.expr(
                "SUM(((n + ctx - 1) div ctx) * ctx - n) * 1e0"
                " / (SUM(n) + SUM(((n + ctx - 1) div ctx) * ctx - n))"
            ).alias("waste_unpacked_ratio"),
        )
        .select(
            F.col("ctx").cast("bigint").alias("ctx"),
            "n_docs",
            "tokens",
            "pad_unpacked",
            "pad_packed",
            "waste_unpacked_ratio",
        )
    )


# --------------------------------------------------------------------------
# Join-cardinality estimation audit (Selinger NDV formula vs actual)
# --------------------------------------------------------------------------

_CARD_ORACLE = """
    WITH s AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_lineitem,
               (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders)
                   AS ndv_orders,
               (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem)
                   AS ndv_lineitem,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey) AS actual
    )
    SELECT n_orders, n_lineitem, ndv_orders, ndv_lineitem, actual,
           CAST(n_orders * n_lineitem // GREATEST(ndv_orders, ndv_lineitem)
                AS BIGINT) AS est_selinger,
           CAST(n_orders * n_lineitem // GREATEST(ndv_orders, ndv_lineitem)
                AS BIGINT) * 1e0 / actual AS est_over_actual
    FROM s
"""


@declared("q_join_cardinality", oracle=_CARD_ORACLE)
def q_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-CARDINALITY estimation audit: the classic Selinger formula
    |A ⋈ B| ≈ |A|·|B| / max(ndv_A(k), ndv_B(k)) scored against the actual
    orders⋈lineitem join size — the NDV-statistics twin of q_kmv_join_est
    (which estimates from mergeable sketches instead of exact NDVs). This
    is the number a cost-based planner uses to pick join order and
    broadcast-vs-shuffle; auditing its error against ground truth is how a
    100 TB deployment decides whether its ANALYZE stats are stale.

    Engine-exactness: counts and NDVs are exact integers; the estimate is
    pure INTEGER floor division (DuckDB `//`, Spark `div` — they agree on
    non-negatives). CAST(double-division AS BIGINT) is banned here: DuckDB
    rounds that cast while Spark truncates, so it diverges whenever the
    quotient's fraction is >= 0.5 (r6 self-review finding — it passed only
    because TPC-H's orderkey NDV makes the division exact). The ratio is
    one 1e0 division of already-exact integers.

    Scale notes (100 TB): NDVs come from map-side-combined distinct
    aggregates (production: approx_count_distinct or KMV partials —
    q_kmv_join_est); the exact join here exists only to score the
    estimate."""
    t = load_tables(spark, sf_dir)
    n_o = t.orders.agg(F.count("*").cast("bigint").alias("n_orders"))
    n_l = t.lineitem.agg(F.count("*").cast("bigint").alias("n_lineitem"))
    ndv_o = t.orders.agg(
        F.countDistinct("o_orderkey").cast("bigint").alias("ndv_orders")
    )
    ndv_l = t.lineitem.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("ndv_lineitem")
    )
    actual = (
        t.orders.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count("*").cast("bigint").alias("actual"))
    )
    return (
        n_o.crossJoin(F.broadcast(n_l))
        .crossJoin(F.broadcast(ndv_o))
        .crossJoin(F.broadcast(ndv_l))
        .crossJoin(F.broadcast(actual))
        .select(
            "n_orders",
            "n_lineitem",
            "ndv_orders",
            "ndv_lineitem",
            "actual",
            F.expr(
                "CAST(n_orders * n_lineitem div GREATEST(ndv_orders, ndv_lineitem)"
                " AS BIGINT)"
            ).alias("est_selinger"),
            F.expr(
                "CAST(n_orders * n_lineitem div GREATEST(ndv_orders, ndv_lineitem)"
                " AS BIGINT) * 1e0 / actual"
            ).alias("est_over_actual"),
        )
    )
