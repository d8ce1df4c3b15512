"""Retrieval operators for RAG-style pipelines (beyond-reference surface,
SURVEY.md §2.D family): positional phrase search, hybrid rank fusion, and
content-defined chunking. No reference implementation exists — designs are
Spark-idiomatic and sized for 100 TB.

Scale notes:
- phrase search pushes the term filter INTO the posting explode (only query
  terms survive the map side — the q_bm25 inverted-index-probe shape) and
  joins adjacency on (doc_id, pos): one posting-sized shuffle.
- rank fusion ranks ONLY inside TakeOrdered top-K lists (per-partition
  heaps; no global window over corpus-sized inputs — the q_skew_audit
  pattern), then fuses two K-row lists with a broadcast-sized join.
- content-defined chunking windows per document (partitioned by doc_id) —
  bounded by document length, embarrassingly parallel across docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import declared
from ..sources.catalog import load_tables

# ---------------------------------------------------------------------------
# Positional phrase search (inverted-index adjacency probe)
# ---------------------------------------------------------------------------

PHRASE = ("table", "scan")  # the exact 2-word phrase to match
PHRASE_TOP = 20

_PHRASE_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), post AS (
        SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos
        FROM d
    ), a AS (
        SELECT doc_id, pos FROM post WHERE w = '{PHRASE[0]}'
    ), b AS (
        SELECT doc_id, pos FROM post WHERE w = '{PHRASE[1]}'
    )
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(a.pos) AS BIGINT) AS first_pos
    FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY a.doc_id
    ORDER BY n_matches DESC, a.doc_id
    LIMIT {PHRASE_TOP}
"""


@declared("q_phrase_search", oracle=_PHRASE_ORACLE)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval ("{w1} {w2}" adjacency) via a POSITIONAL
    inverted-index probe: explode words with positions, keep only the two
    query terms (filter pushed into the posting extraction — the map side
    emits query-term postings, never the corpus), join on (doc_id,
    pos+1-adjacency), rank docs by match count. Top-k is TakeOrdered.

    Engine-exactness: pure integers; Spark posexplode is 0-based so +1
    aligns positions with DuckDB generate_subscripts.

    Scale (100 TB): posting extraction is a narrow map; the adjacency join
    shuffles only query-term postings (corpus-frequency-of-terms rows, not
    corpus rows); a production system would pre-materialize the positional
    index partitioned by term."""
    t = load_tables(spark, sf_dir)
    post = (
        t.documents.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "w")
        )
        .filter(F.col("w").isin(*PHRASE))
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "w")
    )
    a = post.filter(F.col("w") == PHRASE[0]).select("doc_id", F.col("pos").alias("pa"))
    b = post.filter(F.col("w") == PHRASE[1]).select("doc_id", F.col("pos").alias("pb"))
    return (
        a.join(b, (a.doc_id == b.doc_id) & (b.pb == a.pa + 1))
        .select(a.doc_id.alias("doc_id"), "pa")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_matches"),
            F.min("pa").cast("bigint").alias("first_pos"),
        )
        .orderBy(F.col("n_matches").desc(), "doc_id")
        .limit(PHRASE_TOP)
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 ⊕ embedding-cosine reciprocal-rank fusion
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_LIST = 50  # per-retriever candidate list length
RRF_TOP = 20
RRF_QUERY_VEC = 0  # vec_id of the query embedding


def _bm25_score_sql() -> str:
    """The q_bm25 scored-docs CTE chain (same integer-exact construction —
    textstats.q_bm25 is the single-retriever sibling)."""
    from .textstats import BM25_QUERY, BM25_SCALE

    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return f"""
    bd AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), bcorpus AS (
        SELECT CAST(SUM(len(ws)) AS BIGINT) AS t_words,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM bd
    ), btf AS (
        SELECT doc_id, w AS term,
               CAST(COUNT(*) AS BIGINT) AS tf,
               CAST(MIN(dl) AS BIGINT) AS dl
        FROM (SELECT doc_id, len(ws) AS dl, unnest(ws) AS w FROM bd)
        WHERE w IN ({terms})
        GROUP BY doc_id, w
    ), bdf AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM btf GROUP BY term
    ), bscored AS (
        SELECT btf.doc_id,
               CAST((2 * {BM25_SCALE} * (2 * c.n_docs - 2 * bdf.df + 1)
                       + (2 * bdf.df + 1)) // (2 * (2 * bdf.df + 1))
                    AS BIGINT)
                   * (22 * c.t_words * btf.tf)
                   // (10 * c.t_words * btf.tf + 3 * c.t_words
                       + 9 * btf.dl * c.n_docs)
                   AS term_score_fx
        FROM btf JOIN bdf ON btf.term = bdf.term CROSS JOIN bcorpus c
    ), bm25 AS (
        SELECT doc_id, CAST(SUM(term_score_fx) AS BIGINT) AS score_fx
        FROM bscored GROUP BY doc_id
    )"""


_RRF_ORACLE = f"""
    WITH {_bm25_score_sql().lstrip()},
    bm_rank AS (
        SELECT doc_id, rb FROM (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY score_fx DESC, doc_id)
                        AS BIGINT) AS rb
            FROM bm25
        ) WHERE rb <= {RRF_LIST}
    ), ex AS (
        SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ), fx AS (
        SELECT vec_id, i, CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xi
        FROM ex
    ), nrm AS (
        SELECT vec_id, SQRT(CAST(SUM(xi * xi) AS DOUBLE)) AS n FROM fx GROUP BY vec_id
    ), qv AS (
        SELECT i, xi FROM fx WHERE vec_id = {RRF_QUERY_VEC}
    ), dots AS (
        SELECT f.vec_id, CAST(SUM(f.xi * q.xi) AS BIGINT) AS dot_fx
        FROM fx f JOIN qv q ON f.i = q.i
        WHERE f.vec_id <> {RRF_QUERY_VEC}
        GROUP BY f.vec_id
    ), cos AS (
        SELECT d.vec_id,
               CAST(d.dot_fx AS DOUBLE) / (na.n * nq.n) AS cosine
        FROM dots d
        JOIN nrm na ON na.vec_id = d.vec_id
        JOIN nrm nq ON nq.vec_id = {RRF_QUERY_VEC}
    ), cos_rank AS (
        SELECT vec_id, rc FROM (
            SELECT vec_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id)
                        AS BIGINT) AS rc
            FROM cos
        ) WHERE rc <= {RRF_LIST}
    ), fused AS (
        SELECT COALESCE(b.doc_id, c.vec_id) AS doc_id, b.rb, c.rc,
               COALESCE(1e0 / ({RRF_K} + b.rb), 0e0)
                 + COALESCE(1e0 / ({RRF_K} + c.rc), 0e0) AS rrf
        FROM bm_rank b FULL OUTER JOIN cos_rank c ON b.doc_id = c.vec_id
    )
    SELECT doc_id, rb, rc, rrf FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT {RRF_TOP}
"""


@declared("q_rrf_fusion", oracle=_RRF_ORACLE)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval readout: BM25 keyword ranks fused with embedding-
    cosine ranks by reciprocal-rank fusion (rrf = Σ 1/(60+rank)) — the
    standard zero-tuning hybrid-search combiner. Documents and embeddings
    share an id space (doc_id ≡ vec_id), as a real corpus-with-embeddings
    table would.

    Engine-exactness: both rank lists are integer-exact (BM25 is q_bm25's
    fixed-point construction; cosine uses the similarity family's 1e6
    fixed-point dot with sqrt — the one bit-exact transcendental); the rrf
    sum is two IEEE double divisions in fixed order, bit-identical across
    engines.

    Scale (100 TB): each retriever ranks only its TakeOrdered top-{RRF_LIST}
    (per-partition heaps; the rank window runs over {RRF_LIST} rows, never
    the corpus — the q_skew_audit pattern); the fusion join is {RRF_LIST}×2
    rows. The corpus-side work is q_bm25's posting probe and one broadcast-
    query-vector cosine pass."""
    from .similarity import fx_cosine_to_query
    from .textstats import bm25_scores

    t = load_tables(spark, sf_dir)

    # --- BM25 arm: THE q_bm25 scoring chain (single shared definition) ---
    bm25 = bm25_scores(t.documents).select("doc_id", "score_fx")
    bm_top = bm25.orderBy(F.col("score_fx").desc(), "doc_id").limit(RRF_LIST)
    wb = Window.orderBy(F.col("score_fx").desc(), "doc_id")  # over RRF_LIST rows
    bm_rank = bm_top.select(
        "doc_id", F.row_number().over(wb).cast("bigint").alias("rb")
    )

    # --- cosine arm: the similarity family's shared fixed-point scorer ---
    cos = fx_cosine_to_query(t.embeddings, RRF_QUERY_VEC)
    cos_top = cos.orderBy(F.col("cosine").desc(), "vec_id").limit(RRF_LIST)
    wc = Window.orderBy(F.col("cosine").desc(), "vec_id")  # over RRF_LIST rows
    cos_rank = cos_top.select(
        F.col("vec_id"), F.row_number().over(wc).cast("bigint").alias("rc")
    )

    # --- fuse (two K-row lists) ---
    fused = bm_rank.join(
        cos_rank, bm_rank.doc_id == cos_rank.vec_id, "full_outer"
    ).select(
        F.coalesce(bm_rank.doc_id, cos_rank.vec_id).alias("doc_id"),
        "rb",
        "rc",
        (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rb")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rc")), F.lit(0.0))
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(RRF_TOP)


# ---------------------------------------------------------------------------
# Content-defined chunking (rolling-boundary splitter for dedup-stable RAG)
# ---------------------------------------------------------------------------

CDC_HEX = "0"  # boundary iff md5(word) starts with this nibble → ~1/16 words


_CDC_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), post AS (
        SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos
        FROM d
    ), marked AS (
        SELECT doc_id, pos,
               CASE WHEN substr(md5(w), 1, 1) = '{CDC_HEX}' THEN 1 ELSE 0 END AS b
        FROM post
    ), chunked AS (
        SELECT doc_id, pos,
               CAST(COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS chunk_id
        FROM marked
    ), sizes AS (
        SELECT doc_id, chunk_id, CAST(COUNT(*) AS BIGINT) AS n_words
        FROM chunked GROUP BY doc_id, chunk_id
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(MAX(n_words) AS BIGINT) AS max_chunk,
           SUM(n_words) * 1e0 / COUNT(*) AS avg_chunk
    FROM sizes GROUP BY doc_id
"""


@declared("q_cdc_chunk", oracle=_CDC_ORACLE)
def q_cdc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking audit: chunk boundaries fall AFTER words
    whose md5 starts with '{CDC_HEX}' (expected chunk ≈ 16 words) — the
    rolling-hash splitter whose boundaries are STABLE under edits (insert a
    paragraph and only the chunks touching it change), unlike q_chunk's
    fixed windows where one insertion shifts every downstream chunk. That
    stability is what makes chunk-level dedup and incremental RAG
    re-indexing work.

    Engine-exactness: md5-nibble boundary test (the house hash-threshold
    idiom), integer prefix-sum chunk ids, one 1e0 division for avg.

    Scale (100 TB): the only window is PARTITIONED by doc_id (bounded by
    document length); everything else is combiner aggregates. Narrow map →
    per-doc window → two groupBys, no corpus-wide window anywhere."""
    t = load_tables(spark, sf_dir)
    post = t.documents.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "w")
    ).select(
        "doc_id",
        (F.col("p0") + 1).alias("pos"),
        F.when(F.substring(F.md5("w"), 1, 1) == CDC_HEX, 1).otherwise(0).alias("b"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    chunked = post.select(
        "doc_id",
        F.coalesce(F.sum("b").over(wdoc), F.lit(0)).cast("bigint").alias("chunk_id"),
    )
    sizes = chunked.groupBy("doc_id", "chunk_id").agg(
        F.count("*").cast("bigint").alias("n_words")
    )
    return sizes.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.max("n_words").cast("bigint").alias("max_chunk"),
        F.expr("SUM(n_words) * 1e0 / COUNT(*)").alias("avg_chunk"),
    )
