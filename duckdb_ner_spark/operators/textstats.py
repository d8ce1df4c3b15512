"""Text-analysis operators (SURVEY.md §2.D D4 + task Tier-D list): top terms,
language-ID heuristic, quality scoring, token counting, fingerprinting.

All JVM-side built-ins (split/explode/filter/aggregate) — zero Python UDFs —
so the plans are whole-stage-codegen'd and shuffle only on (lang, word) or
doc_id. Every query here has a full DuckDB oracle.

Scale notes (100 TB): term-frequency is the canonical map-side-combine agg
(partial counts per partition before the shuffle); per-doc scores are
shuffle-free narrow projections; the fingerprint explode shuffles |words|
rows keyed by doc_id — bucketing documents by doc_id makes it co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import declared
from ..sources.catalog import load_tables
from .textprep import words_col

# deterministic marker lists for the lang-ID heuristic (the synthetic corpus
# shares one vocabulary across langs — the operator's *mechanics* are the
# deliverable; with real corpora these are per-language stopword lists)
MARKERS_EN = ("the", "a", "is")
MARKERS_QUERY = ("join", "filter", "scan", "sort")
STOPWORDS = ("the", "a", "is", "in")


@declared(
    "q_text_stats",
    oracle="""
    WITH w AS (
        SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ), c AS (
        SELECT lang, word, COUNT(*) AS cnt FROM w GROUP BY lang, word
    ), r AS (
        SELECT lang, word, cnt,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, word) AS rn
        FROM c
    )
    SELECT lang, word, cnt, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language (explode → two-level agg → windowed top-k)."""
    t = load_tables(spark, sf_dir)
    w = t.documents.select("lang", F.explode(words_col()).alias("word"))
    c = w.groupBy("lang", "word").agg(F.count("*").alias("cnt"))
    win = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("word"))
    return (
        c.withColumn("rn", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rn") <= 5)
        .select("lang", "word", "cnt", "rn")
    )


@declared(
    "q_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               LEN(LIST_FILTER(string_split(text, ' '),
                   w -> w IN ({", ".join(repr(m) for m in MARKERS_EN)}))) AS score_en,
               LEN(LIST_FILTER(string_split(text, ' '),
                   w -> w IN ({", ".join(repr(m) for m in MARKERS_QUERY)}))) AS score_q
        FROM documents
    )
    SELECT doc_id, lang,
           CAST(score_en AS INT) AS score_en,
           CAST(score_q AS INT) AS score_q,
           CASE WHEN score_en >= 3 THEN 'en'
                WHEN score_q > score_en THEN 'qlang'
                ELSE 'unknown' END AS pred_lang
    FROM scored
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker-count language-ID heuristic: count marker-token hits per
    candidate language, argmax with a confidence floor."""
    t = load_tables(spark, sf_dir)
    en_list = ", ".join(repr(m) for m in MARKERS_EN)
    q_list = ", ".join(repr(m) for m in MARKERS_QUERY)
    score_en = F.expr(f"size(filter(split(text, ' '), w -> w IN ({en_list})))")
    score_q = F.expr(f"size(filter(split(text, ' '), w -> w IN ({q_list})))")
    d = t.documents.select(
        "doc_id",
        "lang",
        score_en.cast("int").alias("score_en"),
        score_q.cast("int").alias("score_q"),
    )
    pred = (
        F.when(F.col("score_en") >= 3, "en")
        .when(F.col("score_q") > F.col("score_en"), "qlang")
        .otherwise("unknown")
    )
    return d.select("doc_id", "lang", "score_en", "score_q", pred.alias("pred_lang"))


@declared(
    "q_quality",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               LEN(string_split(text, ' ')) AS n_words,
               LENGTH(text) AS n_chars,
               LEN(LIST_FILTER(string_split(text, ' '),
                   w -> w IN ({", ".join(repr(s) for s in STOPWORDS)}))) AS n_stop
        FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS INT) AS n_words,
           CAST(n_chars AS BIGINT) AS n_chars,
           (n_chars - (n_words - 1)) * 1.0 / n_words AS avg_word_len,
           n_stop * 1.0 / n_words AS stopword_ratio,
           CAST(n_words >= 10 AND n_stop * 1.0 / n_words < 0.5 AS INT) AS passes
    FROM base
    """,
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, word-shape and stopword-ratio gates (the
    punctuation ratio is 0 on this corpus; the gate composition is the op).
    Divisions are int/int on identical operands → bit-identical doubles."""
    t = load_tables(spark, sf_dir)
    stop_list = ", ".join(repr(s) for s in STOPWORDS)
    base = t.documents.select(
        "doc_id",
        F.size(words_col()).alias("n_words"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.expr(f"size(filter(split(text, ' '), w -> w IN ({stop_list})))").alias("n_stop"),
    )
    awl = (F.col("n_chars") - (F.col("n_words") - 1)) * F.lit(1.0) / F.col("n_words")
    sr = F.col("n_stop") * F.lit(1.0) / F.col("n_words")
    return base.select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        "n_chars",
        awl.alias("avg_word_len"),
        sr.alias("stopword_ratio"),
        ((F.col("n_words") >= 10) & (sr < 0.5)).cast("int").alias("passes"),
    )


@declared(
    "q_token_count",
    oracle="""
    SELECT doc_id,
           CAST(LEN(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(LEN(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS re_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS byte_pair_est
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens, and the
    chars/4 heuristic estimate."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.size(words_col()).cast("int").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), F.lit(0)))
        .cast("int")
        .alias("re_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_pair_est"),
    )


@declared(
    "q_heavy_hitters",
    oracle="""
    WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ), sketch AS (
        -- 2-row x 64-bucket count-min: bucket = first hex nibbles of seeded md5
        SELECT r, b, COUNT(*) AS c
        FROM (
            SELECT word, 0 AS r,
                   CAST(('0x' || SUBSTRING(md5('r0|' || word), 1, 2)) AS INT) % 64 AS b
            FROM w
            UNION ALL
            SELECT word, 1 AS r,
                   CAST(('0x' || SUBSTRING(md5('r1|' || word), 1, 2)) AS INT) % 64 AS b
            FROM w
        ) GROUP BY r, b
    ), top_words AS (
        SELECT word, COUNT(*) AS exact_cnt
        FROM w GROUP BY word ORDER BY exact_cnt DESC, word LIMIT 10
    )
    SELECT t.word, t.exact_cnt,
           CAST(LEAST(
             (SELECT c FROM sketch WHERE r = 0
              AND b = CAST(('0x' || SUBSTRING(md5('r0|' || t.word), 1, 2)) AS INT) % 64),
             (SELECT c FROM sketch WHERE r = 1
              AND b = CAST(('0x' || SUBSTRING(md5('r1|' || t.word), 1, 2)) AS INT) % 64)
           ) AS BIGINT) AS cm_estimate
    FROM top_words t
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters, engine-portable by construction: the
    bucket hash is md5-derived (identical hex in both engines), so the
    DuckDB oracle rebuilds the *same sketch* and the estimates hash-match.
    CM guarantee (estimate ≥ exact) is pinned in pytest.

    Scale notes: the sketch is 2×64 counters — a groupBy over (row, bucket)
    with map-side combine; the estimate lookup is a broadcast join of the
    tiny sketch onto the candidate words. At 100 TB widen to 4×4096 buckets;
    same plan."""
    t = load_tables(spark, sf_dir)
    w = t.documents.select(F.explode(words_col()).alias("word"))

    def bucket(r: int) -> F.Column:
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"r{r}|"), F.col("word"))), 1, 2), 16, 10)
            .cast("int")
            % 64
        )

    rows = w.select(F.lit(0).alias("r"), bucket(0).alias("b")).unionAll(
        w.select(F.lit(1).alias("r"), bucket(1).alias("b"))
    )
    sketch = rows.groupBy("r", "b").agg(F.count("*").alias("c"))
    top = (
        w.groupBy("word")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "word")
        .limit(10)
    )
    s0 = sketch.filter(F.col("r") == 0).select(F.col("b").alias("b0"), F.col("c").alias("c0"))
    s1 = sketch.filter(F.col("r") == 1).select(F.col("b").alias("b1"), F.col("c").alias("c1"))
    return (
        top.withColumn("b0", bucket(0))
        .withColumn("b1", bucket(1))
        .join(F.broadcast(s0), "b0")
        .join(F.broadcast(s1), "b1")
        .select(
            "word",
            "exact_cnt",
            F.least(F.col("c0"), F.col("c1")).cast("bigint").alias("cm_estimate"),
        )
    )


@declared(
    "q_fingerprint",
    oracle="""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    )
    SELECT doc_id,
           CAST(SUM(pos * (LENGTH(word) * 31 + ASCII(SUBSTRING(word, 1, 1)))) AS BIGINT)
               % 1000000007 AS fingerprint,
           MIN(md5(word)) AS min_word_hash
    FROM w GROUP BY doc_id
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: position-weighted word-code rolling sum mod a
    prime (engine-portable), plus the md5 min-hash anchor. Pure integer
    arithmetic → exact parity. A production 64-bit rolling hash swaps the
    word code for xxhash64(word) — same plan shape."""
    t = load_tables(spark, sf_dir)
    w = t.documents.select(
        "doc_id", F.posexplode(words_col()).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    code = F.length("word").cast("bigint") * 31 + F.ascii(F.substring("word", 1, 1))
    return w.groupBy("doc_id").agg(
        (F.sum(F.col("pos") * code) % F.lit(1000000007)).alias("fingerprint"),
        F.min(F.md5("word")).alias("min_word_hash"),
    )


# --------------------------------------------------------------------------
# TF-IDF distinctive terms per document (float-safe rational scoring)
# --------------------------------------------------------------------------

TFIDF_TOP = 3

_TFIDF_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term
    ), df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY term
    ), n AS (SELECT COUNT(*) AS n FROM documents
    ), s AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf AS DOUBLE) * CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)
                 AS score
        FROM tf JOIN df USING (term), n
    ), r AS (
        SELECT doc_id, term, tf, df, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rnk
        FROM s
    )
    SELECT doc_id, term, tf, df, CAST(rnk AS BIGINT) AS rnk,
           ROUND(score, 6) AS score
    FROM r WHERE rnk <= {TFIDF_TOP}
"""


@declared("q_tfidf", oracle=_TFIDF_ORACLE)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{3} distinctive terms per document by tf·N/df — tf-idf with the
    raw inverse-document-frequency RATIO instead of its logarithm, because
    ln() is not guaranteed correctly-rounded across libms and a 1-ulp
    divergence fails the hash gate; the ratio is two exact integer-valued
    doubles and one division, bit-identical in both engines, and induces the
    SAME per-doc ranking as log tf-idf for tf=const (monotone transform).

    Scale notes (100 TB): tf is the canonical map-side-combine aggregate
    keyed (doc, term); df runs a second explode pass keyed term — Catalyst
    does not share subtrees across aggregates, and that is the right
    trade anyway: re-running a narrow split+explode costs a scan, while
    materializing the word-level table costs |corpus|×|words| storage. The
    df table is corpus-vocabulary-sized — broadcastable for natural-language
    vocabularies; the final top-k windows only the (doc, term) score rows.
    The N scalar rides in via a 1-row broadcast cross join."""
    t = load_tables(spark, sf_dir)
    w = t.documents.select("doc_id", F.explode(words_col("text")).alias("term"))
    tf = w.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = w.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = t.documents.agg(F.count("*").alias("n"))
    score = (
        F.col("tf").cast("double") * F.col("n").cast("double") / F.col("df").cast("double")
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", "tf", "df", score.alias("score"))
    )
    win = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= TFIDF_TOP)
        .select("doc_id", "term", "tf", "df", F.col("rnk").cast("bigint").alias("rnk"),
                F.round("score", 6).alias("score"))
    )


# --------------------------------------------------------------------------
# Quantized-surprisal quality score (CCNet-style perplexity filter, made
# engine-exact)
# --------------------------------------------------------------------------

# Doc-level quantized-surprisal scores as a reusable SQL block (no ORDER BY)
# — q_surprisal consumes it directly; curation.py's CCNet-style bucketing
# wraps it in a further window + aggregate.
SURPRISAL_DOC_SQL = """
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
        SELECT w, COUNT(*) AS n FROM w GROUP BY w
    ), tot AS (
        SELECT COUNT(*) AS total FROM w
    ), s AS (
        SELECT w.doc_id, CAST(LENGTH(bin(t.total // f.n)) - 1 AS BIGINT) AS q
        FROM w JOIN freq f ON w.w = f.w CROSS JOIN tot t
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(q) AS BIGINT) AS sum_surprisal,
           CAST(SUM(q) AS DOUBLE) / COUNT(*) AS avg_surprisal
    FROM s
    GROUP BY doc_id
"""

_SURPRISAL_ORACLE = SURPRISAL_DOC_SQL + " ORDER BY avg_surprisal DESC, doc_id"


@declared("q_surprisal", oracle=_SURPRISAL_ORACLE)
def q_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-surprisal quality scoring — the shape of a CCNet/Gopher-style
    perplexity filter: score every document by the average information
    content of its words under the corpus's own unigram model; the high tail
    is rare-token noise, the low tail is boilerplate/repetition.

    Engine-exact trick: real surprisal is -ln p(w), and ln() is not
    bit-identical across engines (the q_tfidf lesson), so the score is the
    QUANTIZED surprisal floor(log2(total/n_w)) computed with pure integer
    math — floor(log2(total/n)) == LENGTH(bin(total div n)) - 1 for
    integers (2^(bitlen-1) <= total div n <= total/n < total div n + 1 <=
    2^bitlen) — then averaged as an exact bigint-sum / count double
    division. Same ranking behavior as the float version at the 1-bit
    granularity a filter threshold actually uses.

    Scale notes (100 TB): word frequencies are the canonical map-side-
    combine aggregate; the freq table is vocabulary-sized — broadcast for
    the scoring join, so the corpus shuffles once (the per-doc aggregate,
    keyed by doc_id)."""
    t = load_tables(spark, sf_dir)
    return surprisal_per_doc(t.documents).orderBy(F.col("avg_surprisal").desc(), "doc_id")


def surprisal_per_doc(documents: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """Doc-level quantized-surprisal scores (doc_id, n_words, sum_surprisal,
    avg_surprisal) — the DataFrame twin of SURPRISAL_DOC_SQL. Shared by
    q_surprisal and the CCNet-style per-language bucketing in curation.py.

    ``carry`` rides doc-functionally-dependent columns (e.g. lang) through
    the per-doc aggregate so downstream stages need no join back to the
    corpus — grouping by (doc_id, dependent-col) is the same grouping, and
    it saves a corpus-sized shuffle join per carried column's consumer."""
    w = documents.select("doc_id", *carry, F.explode(words_col("text")).alias("w"))
    freq = w.groupBy("w").agg(F.count("*").alias("n"))
    # total word count derived from the vocabulary-sized freq table — one
    # fewer full corpus explode than a separate w.count() pass
    tot = freq.agg(F.sum("n").alias("total"))
    q = (F.length(F.bin(F.expr("total div n"))) - 1).cast("bigint")
    s = (
        w.join(F.broadcast(freq), "w")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", *carry, q.alias("q"))
    )
    return s.groupBy("doc_id", *carry).agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum("q").cast("bigint").alias("sum_surprisal"),
        (F.sum("q").cast("double") / F.count("*")).alias("avg_surprisal"),
    )


# --------------------------------------------------------------------------
# PMI collocation mining (rational fixed-point, top-k phrases)
# --------------------------------------------------------------------------

PMI_SCALE = 1_000_000
PMI_MIN_COUNT = 5  # bigram support floor (noise gate)
PMI_TOP = 50


_PMI_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), bg AS (
        SELECT unnest([struct_pack(w1 := ws[i], w2 := ws[i+1])
                       FOR i IN range(1, len(ws))]) AS p
        FROM d
    ), pairs AS (
        SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS n_xy FROM bg GROUP BY 1, 2
    ), uni AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ) GROUP BY w
    ), tot AS (
        SELECT CAST(SUM(n_xy) AS BIGINT) AS n_total FROM pairs
    )
    SELECT p.w1, p.w2, p.n_xy,
           p.n_xy * t.n_total * {PMI_SCALE} // (u1.n * u2.n) AS pmi_fx
    FROM pairs p
    JOIN uni u1 ON p.w1 = u1.w
    JOIN uni u2 ON p.w2 = u2.w
    CROSS JOIN tot t
    WHERE p.n_xy >= {PMI_MIN_COUNT}
    ORDER BY pmi_fx DESC, w1, w2
    LIMIT {PMI_TOP}
"""


@declared("q_pmi", oracle=_PMI_ORACLE)
def q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining: rank adjacent word pairs by pointwise mutual
    information — the phrase-detection pass a tokenizer-training or
    phrase-vocabulary pipeline runs over the corpus. A high-PMI pair
    co-occurs far more often than its words' independent frequencies
    predict.

    Engine-exactness: PMI's log is monotone, so ranking by the RATIONAL
    inside n_xy·N/(n_x·n_y) ranks identically to PMI itself — kept in 1e6
    fixed-point BIGINT (the q_dsir trick; no cross-engine ln()). The top-k
    row set is pinned by the (pmi_fx DESC, w1, w2) total order.

    Scale notes (100 TB): bigram and unigram counts are the canonical
    map-side-combine aggregates; the unigram table is corpus-vocabulary-
    sized — broadcast here (natural-language vocabularies fit), with the
    documented fallback of a shuffled join on w1/w2 when it doesn't; the
    support floor prunes the pair table before both joins; top-k is
    TakeOrdered (no global sort materialization)."""
    t = load_tables(spark, sf_dir)
    ws = F.col("ws")
    m = F.size(ws) - 1
    bigrams = F.when(
        F.size(ws) >= 2,
        F.zip_with(
            F.slice(ws, 1, m), F.slice(ws, 2, m), lambda x, y: F.struct(x.alias("w1"), y.alias("w2"))
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<w1:string,w2:string>>)"))
    pairs_all = (
        t.documents.select(F.split("text", " ").alias("ws"))
        .select(F.explode(bigrams).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("n_xy"))
        # persisted: feeds BOTH the full-mass total and the filtered
        # candidate set — without it each reference re-runs the bigram
        # explode+aggregate over the corpus (the q_dedup_near pattern)
        .persist()
    )
    # N is the FULL bigram mass (before the support floor) — the floor
    # prunes candidates, it must not reweight the probability model
    tot = pairs_all.agg(F.sum("n_xy").cast("bigint").alias("n_total"))
    pairs = pairs_all.filter(F.col("n_xy") >= PMI_MIN_COUNT)
    uni = (
        t.documents.select(F.explode(words_col("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    scored = (
        pairs.join(F.broadcast(uni.select(F.col("w").alias("w1"), F.col("n").alias("n1"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"), F.col("n").alias("n2"))), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_xy",
            F.expr(f"n_xy * n_total * {PMI_SCALE} div (n1 * n2)").alias("pmi_fx"),
        )
    )
    return scored.orderBy(F.col("pmi_fx").desc(), "w1", "w2").limit(PMI_TOP)


# --------------------------------------------------------------------------
# BM25-style ranked retrieval (integer-exact, log-free rational idf)
# --------------------------------------------------------------------------

BM25_QUERY = ("dup", "join", "scan")  # mixed-rarity query terms
BM25_TOP = 20
BM25_SCALE = 1_000_000
# k1=1.2, b=0.75 folded into integer coefficients: with T = total corpus
# words and N = docs, avgdl = T/N, so
#   tf_norm = tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)
#           = 22*T*tf / (10*T*tf + 3*T + 9*dl*N)     [x10T, exact integers]


def _bm25_terms_sql() -> str:
    return ", ".join(f"'{t}'" for t in BM25_QUERY)


_BM25_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), corpus AS (
        SELECT CAST(SUM(len(ws)) AS BIGINT) AS t_words,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM d
    ), tf AS (
        SELECT doc_id, w AS term,
               CAST(COUNT(*) AS BIGINT) AS tf,
               CAST(MIN(dl) AS BIGINT) AS dl
        FROM (
            SELECT doc_id, len(ws) AS dl, unnest(ws) AS w FROM d
        )
        WHERE w IN ({_bm25_terms_sql()})
        GROUP BY doc_id, w
    ), df AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), scored AS (
        SELECT tf.doc_id,
               CAST((2 * {BM25_SCALE} * (2 * c.n_docs - 2 * df.df + 1)
                       + (2 * df.df + 1)) // (2 * (2 * df.df + 1))
                    AS BIGINT)
                   * (22 * c.t_words * tf.tf)
                   // (10 * c.t_words * tf.tf + 3 * c.t_words + 9 * tf.dl * c.n_docs)
                   AS term_score_fx
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN corpus c
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(term_score_fx) AS BIGINT) AS score_fx
    FROM scored
    GROUP BY doc_id
    ORDER BY score_fx DESC, doc_id
    LIMIT {BM25_TOP}
"""


@declared("q_bm25", oracle=_BM25_ORACLE)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-style ranked retrieval for a fixed keyword query — the missing
    half of q_tfidf (which profiles documents; this RANKS them for a
    query): per-term scores combine rarity (idf) with a saturating,
    length-normalized term frequency (k1=1.2, b=0.75).

    Engine-exactness, two deviations from textbook BM25, both documented:
    (1) idf is the RATIONAL (N-df+0.5)/(df+0.5) = (2N-2df+1)/(2df+1) in 1e6
    fixed point, rounded half-away with PURE INTEGER arithmetic
    ((2*SCALE*num + den) div (2*den), all terms positive) — true BM25 wraps
    it in ln(1+..), and ln() is not bit-identical across engines (the
    q_tfidf lesson); decimal literals are also out, because Spark divides
    DECIMAL/DECIMAL at reduced scale (HALF_UP) while DuckDB promotes to
    DOUBLE — two differently-rounded intermediates under the same ROUND()
    (the r4 ADVICE finding); the ranking effect is to weight very-rare
    terms more steeply. (2) the tf normalization is cleared of fractions by
    multiplying through by 10T (avgdl = T/N exactly), making the entire
    per-term score integer arithmetic; per-document totals are integer sums
    — order-independent, bit-equal.

    Scale notes (100 TB): the posting extraction pushes the term filter
    into the explode (only query-term instances survive the map side); df
    and the corpus totals are query-sized and 1-row broadcasts; the only
    corpus-wide shuffle is the (doc, term) tf aggregate, and top-k is
    TakeOrdered. This is exactly an inverted-index probe expressed
    relationally — a production system would pre-materialize the tf table
    as the index."""
    t = load_tables(spark, sf_dir)
    return (
        bm25_scores(t.documents)
        .orderBy(F.col("score_fx").desc(), "doc_id")
        .limit(BM25_TOP)
    )


def bm25_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, n_terms, score_fx): the integer-exact BM25 scoring chain
    for the BM25_QUERY terms — the SINGLE Spark-side definition, shared by
    q_bm25 and retrieval.q_rrf_fusion (the r5 review flagged the formula
    living in multiple copies; a formula change now lands everywhere or
    nowhere)."""
    d = documents.select("doc_id", F.split("text", " ").alias("ws"))
    corpus = d.agg(
        F.sum(F.size("ws")).cast("bigint").alias("t_words"),
        F.count("*").cast("bigint").alias("n_docs"),
    )
    tf = (
        d.select("doc_id", F.size("ws").alias("dl"), F.explode("ws").alias("term"))
        .filter(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"), F.min("dl").cast("bigint").alias("dl"))
        # posting-list-sized (docs x query terms); feeds df AND the scoring
        # join — persist so the corpus explode runs once (house pattern)
        .persist()
    )
    df = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            (
                F.expr(
                    f"CAST((2 * {BM25_SCALE} * (2 * n_docs - 2 * df + 1)"
                    " + (2 * df + 1)) div (2 * (2 * df + 1)) AS BIGINT)"
                )
                * F.expr("22 * t_words * tf")
            ).alias("num")
            .cast("bigint"),
            F.expr("10 * t_words * tf + 3 * t_words + 9 * dl * n_docs").alias("den"),
        )
        .select("doc_id", F.expr("num div den").alias("term_score_fx"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.sum("term_score_fx").cast("bigint").alias("score_fx"),
    )


# --------------------------------------------------------------------------
# Intra-document quantized entropy (repetitiveness quality signal)
# --------------------------------------------------------------------------

_ENTROPY_ORACLE = """
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), docfreq AS (
        SELECT doc_id, w, COUNT(*) AS n FROM w GROUP BY doc_id, w
    ), doclen AS (
        SELECT doc_id, CAST(SUM(n) AS BIGINT) AS len FROM docfreq GROUP BY doc_id
    ), s AS (
        SELECT f.doc_id, f.n,
               CAST(LENGTH(bin(l.len // f.n)) - 1 AS BIGINT) AS q
        FROM docfreq f JOIN doclen l ON f.doc_id = l.doc_id
    )
    SELECT s.doc_id,
           CAST(l.len AS BIGINT) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(s.n * s.q) AS BIGINT) AS sum_surprisal,
           SUM(s.n * s.q) * 1.0 / l.len AS avg_entropy_bits
    FROM s JOIN doclen l ON s.doc_id = l.doc_id
    GROUP BY s.doc_id, l.len
"""


@declared("q_entropy", oracle=_ENTROPY_ORACLE)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document quantized entropy: each document scored against its
    OWN word distribution — the repetitiveness signal (a page that repeats
    one phrase has near-zero self-entropy however rare its words are
    corpus-wide). Complements q_surprisal, which scores against the CORPUS
    unigram model: low intra-doc entropy flags repetition, low corpus
    surprisal flags boilerplate.

    Engine-exactness: per-word self-information -log2(n_w/len) is quantized
    with the integer bit-length trick (floor(log2(len div n)) ==
    bitlen(len div n) - 1 — the q_surprisal identity), so the per-doc sum
    is pure BIGINT and the average one exact int division.

    Scale: two combiner-friendly aggregates keyed by doc_id — the word rows
    never shuffle to any other key; zero joins against corpus-wide state."""
    t = load_tables(spark, sf_dir)
    w = t.documents.select("doc_id", F.explode(words_col("text")).alias("w"))
    docfreq = w.groupBy("doc_id", "w").agg(F.count("*").alias("n"))
    doclen = docfreq.groupBy("doc_id").agg(F.sum("n").cast("bigint").alias("len"))
    s = docfreq.join(doclen, "doc_id").select(
        "doc_id",
        "n",
        "len",
        F.expr("CAST(LENGTH(bin(len div n)) - 1 AS BIGINT)").alias("q"),
    )
    return s.groupBy("doc_id", "len").agg(
        F.count("*").cast("bigint").alias("n_distinct"),
        F.sum(F.expr("n * q")).cast("bigint").alias("sum_surprisal"),
        F.expr("SUM(n * q) * 1e0 / len").alias("avg_entropy_bits"),
    ).select(
        "doc_id",
        F.col("len").alias("n_words"),
        "n_distinct",
        "sum_surprisal",
        "avg_entropy_bits",
    )


# --------------------------------------------------------------------------
# Vocabulary coverage curve (tokenizer-design statistic)
# --------------------------------------------------------------------------

COVERAGE_MARKS = (50, 90, 99)  # percent-of-token-mass marks


_COVERAGE_ORACLE = f"""
    WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY w
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS vocab
        FROM freq
    ), ranked AS (
        SELECT n,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w) AS BIGINT) AS rnk,
               CAST(SUM(n) OVER (ORDER BY n DESC, w
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM freq
    )
    SELECT CAST(m.mark AS BIGINT) AS mark,
           CAST(MIN(r.rnk) AS BIGINT) AS k_words,
           t.vocab,
           MIN(r.rnk) * 1.0 / t.vocab AS vocab_frac
    FROM (SELECT unnest([{", ".join(str(m) for m in COVERAGE_MARKS)}]) AS mark) m
    CROSS JOIN tot t
    JOIN ranked r ON r.cum * 100 >= m.mark * t.total
    GROUP BY m.mark, t.vocab
"""


@declared("q_vocab_coverage", oracle=_COVERAGE_ORACLE)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the smallest k such that the k most
    frequent words cover 50/90/99% of all token mass — the statistic that
    sizes a tokenizer vocabulary or a stopword list (natural corpora are
    Zipfian: tiny k covers half the mass; this synthetic corpus is near-
    uniform, which the curve makes visible).

    Engine-exactness: the coverage test is the integer cross-multiplication
    cum*100 >= mark*total (no percentage doubles); ranking is pinned by the
    (n DESC, w) total order. The oracle ranks per word; this plan never
    materializes a per-word rank — it collapses each equal-frequency class
    (all words sharing count n) to one row and solves the crossing rank
    arithmetically: within a class, cum advances by exactly n per word, so
    the first rank satisfying (cum_before + j*n)*100 >= mark*total is
    j = ceil((mark*total - 100*cum_before) / (100*n)) — pure BIGINT math,
    identical to the oracle's MIN(rnk) because word order within a class
    never changes which rank crosses.

    Scale (the VERDICT r4 fix): no vocabulary-sized window anywhere. Word
    frequency is the canonical combiner aggregate; it collapses to one row
    per DISTINCT COUNT VALUE (at most O(sqrt(2*total_tokens)) classes since
    distinct counts c1>c2>... must sum to <= total), the per-class prefix
    sums run partitioned by the count's bit-length band (band b holds
    < min(2^(b-1), total/2^(b-1)) <= sqrt(total) classes), and only the
    <= 64-row per-band table crosses a global window."""
    t = load_tables(spark, sf_dir)
    w = t.documents.select(F.explode(words_col("text")).alias("w"))
    freq = w.groupBy("w").agg(F.count("*").cast("bigint").alias("n"))
    tot = freq.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    # One row per distinct count value; band = integer bit-length of n
    # (the repo's exact floor(log2) idiom, cf. q_surprisal).
    per_n = (
        freq.groupBy("n")
        .agg(F.count("*").cast("bigint").alias("words_n"))
        .withColumn("mass_n", F.expr("CAST(n * words_n AS BIGINT)"))
        .withColumn("band", F.length(F.bin(F.col("n"))).cast("bigint"))
    )
    # Tiny global window: <= 64 band rows (bigint bit-lengths).
    wb = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    band_off = (
        per_n.groupBy("band")
        .agg(
            F.sum("mass_n").cast("bigint").alias("band_mass"),
            F.sum("words_n").cast("bigint").alias("band_words"),
        )
        .select(
            "band",
            F.coalesce(F.sum("band_mass").over(wb), F.lit(0))
            .cast("bigint")
            .alias("mass_off"),
            F.coalesce(F.sum("band_words").over(wb), F.lit(0))
            .cast("bigint")
            .alias("words_off"),
        )
    )
    # Within-band running sums, partitioned — bounded by classes-per-band.
    wn = Window.partitionBy("band").orderBy(F.col("n").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    classes = (
        per_n.withColumn(
            "mass_in", F.coalesce(F.sum("mass_n").over(wn), F.lit(0)).cast("bigint")
        )
        .withColumn(
            "words_in", F.coalesce(F.sum("words_n").over(wn), F.lit(0)).cast("bigint")
        )
        .join(F.broadcast(band_off), "band")
        .select(
            "n",
            "words_n",
            "mass_n",
            F.expr("CAST(mass_off + mass_in AS BIGINT)").alias("cum_before"),
            F.expr("CAST(words_off + words_in AS BIGINT)").alias("rank_before"),
        )
    )
    # JVM-side literal relation (createDataFrame would plan a python-pickled
    # ExistingRDD scan — a pointless Python boundary for 3 constants)
    marks = spark.range(1).select(
        F.explode(F.array(*[F.lit(m) for m in COVERAGE_MARKS])).alias("mark")
    )
    # Crossing class per mark = the LARGEST n whose class end reaches the
    # threshold (cum is monotone in descending-n order); then solve for the
    # in-class rank j with exact integer ceil division (all terms >= 1).
    crossing = (
        marks.crossJoin(F.broadcast(tot))
        .join(
            classes,
            F.expr("(cum_before + mass_n) * 100 >= mark * total"),
        )
        .groupBy("mark", "total", "vocab")
        .agg(
            F.max(
                F.struct(
                    F.col("n"), F.col("cum_before"), F.col("rank_before")
                )
            ).alias("c")
        )
    )
    return crossing.select(
        F.col("mark").cast("bigint").alias("mark"),
        F.expr(
            "CAST(c.rank_before + "
            " (mark * total - 100 * c.cum_before + 100 * c.n - 1) div (100 * c.n)"
            " AS BIGINT)"
        ).alias("k_words"),
        "vocab",
        F.expr(
            "(c.rank_before + "
            " (mark * total - 100 * c.cum_before + 100 * c.n - 1) div (100 * c.n))"
            " * 1e0 / vocab"
        ).alias("vocab_frac"),
    )


# --------------------------------------------------------------------------
# Bigram-LM quantized surprisal (sequence-aware quality scoring)
# --------------------------------------------------------------------------

_BIGRAM_SURPRISAL_ORACLE = """
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), bg AS (
        SELECT doc_id, unnest([struct_pack(w1 := ws[i], w2 := ws[i+1])
                               FOR i IN range(1, len(ws))]) AS p
        FROM d
    ), pair AS (
        SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS n_xy
        FROM bg GROUP BY 1, 2
    ), head AS (
        SELECT w1, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM pair GROUP BY w1
    ), s AS (
        SELECT bg.doc_id,
               CAST(LENGTH(bin(h.n_x // pr.n_xy)) - 1 AS BIGINT) AS q
        FROM bg
        JOIN pair pr ON bg.p.w1 = pr.w1 AND bg.p.w2 = pr.w2
        JOIN head h ON h.w1 = pr.w1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(q) AS BIGINT) AS sum_surprisal,
           CAST(SUM(q) AS DOUBLE) / COUNT(*) AS avg_surprisal
    FROM s GROUP BY doc_id
"""


@declared("q_bigram_surprisal", oracle=_BIGRAM_SURPRISAL_ORACLE)
def q_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprisal scoring: every document scored by the average
    conditional information -log2 P(w2 | w1) under the corpus's own bigram
    model — the SEQUENCE-aware quality signal q_surprisal's unigram model
    cannot see (a doc of common words in impossible orders scores normal
    under unigrams, high here; template boilerplate scores near zero
    because its transitions are deterministic).

    Engine-exactness: the q_surprisal integer bit-length trick applied to
    the conditional — floor(log2(n_w1 / n_pair)) == bitlen(n_w1 div
    n_pair) - 1, with n_w1 = Σ bigrams starting with w1 so n_pair <= n_w1
    and the quotient is >= 1; BIGINT sums, one final division.

    Scale notes (100 TB): bigram counts are the canonical combiner
    aggregate; the scoring join is keyed on the bigram itself — the pair
    table shuffles against the corpus bigrams (both already aggregated /
    narrow); head-word totals derive from the pair table (no extra corpus
    pass) and broadcast."""
    t = load_tables(spark, sf_dir)
    ws = F.col("ws")
    m = F.size(ws) - 1
    bigrams = F.when(
        F.size(ws) >= 2,
        F.zip_with(
            F.slice(ws, 1, m), F.slice(ws, 2, m),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<w1:string,w2:string>>)"))
    bg = (
        t.documents.select("doc_id", F.split("text", " ").alias("ws"))
        .select("doc_id", F.explode(bigrams).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
        .persist()  # feeds the pair counts AND the per-doc scoring join
    )
    pair = bg.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("n_xy"))
    head = pair.groupBy("w1").agg(F.sum("n_xy").cast("bigint").alias("n_x"))
    scored = (
        bg.join(pair, ["w1", "w2"])
        .join(F.broadcast(head), "w1")
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("n_x div n_xy"))) - 1).cast("bigint").alias("q"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.sum("q").cast("bigint").alias("sum_surprisal"),
        (F.sum("q").cast("double") / F.count("*")).alias("avg_surprisal"),
    )


# --------------------------------------------------------------------------
# Multi-signal quality gate (the composed keep/drop filter verdict)
# --------------------------------------------------------------------------

GATE_MIN_WORDS = 20  # too_short below this
# ratios as exact integer cross-multiplications (numerator, denominator):
GATE_DISTINCT_NUM, GATE_DISTINCT_DEN = 2, 5  # repetitive: distinct/words < 2/5
GATE_LOW_BITS = 3  # boilerplate: avg unigram surprisal < 3 bits
GATE_HIGH_BITS = 9  # noise: avg unigram surprisal > 9 bits

_QUALITY_GATE_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
        SELECT w, COUNT(*) AS n FROM w GROUP BY w
    ), tot AS (
        SELECT COUNT(*) AS total FROM w
    ), per_doc AS (
        SELECT w.doc_id, w.lang,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(COUNT(DISTINCT w.w) AS BIGINT) AS n_distinct,
               CAST(SUM(LENGTH(bin(t.total // f.n)) - 1) AS BIGINT) AS sum_q
        FROM w JOIN freq f ON w.w = f.w CROSS JOIN tot t
        GROUP BY w.doc_id, w.lang
    ), flags AS (
        SELECT lang,
               CASE WHEN n_words < {GATE_MIN_WORDS} THEN 1 ELSE 0 END AS too_short,
               CASE WHEN n_distinct * {GATE_DISTINCT_DEN}
                         < {GATE_DISTINCT_NUM} * n_words THEN 1 ELSE 0 END AS repetitive,
               CASE WHEN sum_q < {GATE_LOW_BITS} * n_words THEN 1 ELSE 0 END AS low_surp,
               CASE WHEN sum_q > {GATE_HIGH_BITS} * n_words THEN 1 ELSE 0 END AS high_surp
        FROM per_doc
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN too_short + repetitive + low_surp + high_surp = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(SUM(too_short) AS BIGINT) AS n_too_short,
           CAST(SUM(repetitive) AS BIGINT) AS n_repetitive,
           CAST(SUM(low_surp) AS BIGINT) AS n_low_surp,
           CAST(SUM(high_surp) AS BIGINT) AS n_high_surp,
           SUM(CASE WHEN too_short + repetitive + low_surp + high_surp = 0
               THEN 1 ELSE 0 END) * 1e0 / COUNT(*) AS keep_rate
    FROM flags GROUP BY lang
"""


@declared("q_quality_gate", oracle=_QUALITY_GATE_ORACLE)
def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed document-filter verdict — the gate a pretraining pipeline
    actually ships, not a single signal: a document is KEPT only if it is
    long enough, lexically diverse (distinct/word ratio), and its unigram
    surprisal sits in the [boilerplate, noise] band. Reported per language
    with per-reason drop counts, because the per-reason mix is what you
    tune (a language whose drops are all `repetitive` needs a template
    fix upstream, not a threshold change).

    Engine-exactness: every threshold is an integer cross-multiplication
    (no ratio doubles); the surprisal band reuses q_surprisal's bit-length
    quantization; one 1e0 division for keep_rate.

    Scale notes (100 TB): ONE corpus explode feeds word counts, distinct
    counts, and the surprisal join (vocabulary-sized freq table broadcast);
    per-doc flags collapse immediately to the per-language audit. A real
    deployment materializes the per-doc flags as the filter column — same
    plan minus the final aggregate."""
    t = load_tables(spark, sf_dir)
    w = t.documents.select("doc_id", "lang", F.explode(words_col("text")).alias("w"))
    freq = w.groupBy("w").agg(F.count("*").alias("n"))
    tot = freq.agg(F.sum("n").alias("total"))
    q = (F.length(F.bin(F.expr("total div n"))) - 1).cast("bigint")
    per_doc = (
        w.join(F.broadcast(freq), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.countDistinct("w").cast("bigint").alias("n_distinct"),
            F.sum(q).cast("bigint").alias("sum_q"),
        )
    )
    too_short = F.when(F.col("n_words") < GATE_MIN_WORDS, 1).otherwise(0)
    repetitive = F.when(
        F.col("n_distinct") * GATE_DISTINCT_DEN < GATE_DISTINCT_NUM * F.col("n_words"), 1
    ).otherwise(0)
    low_surp = F.when(F.col("sum_q") < GATE_LOW_BITS * F.col("n_words"), 1).otherwise(0)
    high_surp = F.when(F.col("sum_q") > GATE_HIGH_BITS * F.col("n_words"), 1).otherwise(0)
    flags = per_doc.select(
        "lang",
        too_short.alias("too_short"),
        repetitive.alias("repetitive"),
        low_surp.alias("low_surp"),
        high_surp.alias("high_surp"),
    )
    keep = F.when(
        F.col("too_short") + F.col("repetitive") + F.col("low_surp") + F.col("high_surp")
        == 0,
        1,
    ).otherwise(0)
    return flags.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(keep).cast("bigint").alias("n_keep"),
        F.sum("too_short").cast("bigint").alias("n_too_short"),
        F.sum("repetitive").cast("bigint").alias("n_repetitive"),
        F.sum("low_surp").cast("bigint").alias("n_low_surp"),
        F.sum("high_surp").cast("bigint").alias("n_high_surp"),
        (F.sum(keep) * F.lit(1.0) / F.count("*")).alias("keep_rate"),
    )


# --------------------------------------------------------------------------
# 2-D corpus histogram: length x surprisal (the QC heatmap)
# --------------------------------------------------------------------------

H2D_LEN_WIDTH = 200  # chars per length bucket
H2D_LEN_CAP = 9  # top bucket collects the tail
H2D_SURP_CAP = 12  # bits cap

_HIST2D_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), freq AS (
        SELECT w, COUNT(*) AS n FROM w GROUP BY w
    ), tot AS (
        SELECT COUNT(*) AS total FROM w
    ), per_doc AS (
        SELECT w.doc_id,
               LEAST(MIN(w.n_chars) // {H2D_LEN_WIDTH}, {H2D_LEN_CAP}) AS len_b,
               LEAST(SUM(LENGTH(bin(t.total // f.n)) - 1) // COUNT(*),
                     {H2D_SURP_CAP}) AS surp_b
        FROM w JOIN freq f ON w.w = f.w CROSS JOIN tot t
        GROUP BY w.doc_id
    )
    SELECT CAST(len_b AS BIGINT) AS len_bucket,
           CAST(surp_b AS BIGINT) AS surp_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM per_doc GROUP BY len_b, surp_b
"""


@declared("q_histogram2d", oracle=_HIST2D_ORACLE)
def q_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D corpus QC heatmap: documents bucketed jointly by length
    ({H2D_LEN_WIDTH}-char equi-width, capped) and mean quantized surprisal
    (whole bits, capped) — the joint view that separates failure modes the
    1-D histograms conflate: short+low-surprisal = navigation boilerplate,
    long+low = template dumps, short+high = tokenizer junk, long+high =
    genuine long-tail content. Fixed integer bucket edges (the q_histogram
    discipline) — NO rank windows, so the heatmap costs two combiner
    aggregates at any scale.

    Engine-exactness: bucket ids are pure integer division with LEAST caps;
    mean surprisal uses integer division (floor of the exact mean) so the
    bucket id never sees a double."""
    t = load_tables(spark, sf_dir)
    w = t.documents.select(
        "doc_id", "n_chars", F.explode(words_col("text")).alias("w")
    )
    freq = w.groupBy("w").agg(F.count("*").alias("n"))
    tot = freq.agg(F.sum("n").alias("total"))
    q = (F.length(F.bin(F.expr("total div n"))) - 1).cast("bigint")
    per_doc = (
        w.join(F.broadcast(freq), "w")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "n_chars", q.alias("qq"))
        .groupBy("doc_id")
        .agg(
            F.least(
                F.expr(f"CAST(MIN(n_chars) div {H2D_LEN_WIDTH} AS BIGINT)"),
                F.lit(H2D_LEN_CAP).cast("bigint"),
            ).alias("len_b"),
            F.least(
                F.expr("CAST(SUM(qq) div COUNT(*) AS BIGINT)"),
                F.lit(H2D_SURP_CAP).cast("bigint"),
            ).alias("surp_b"),
        )
    )
    return per_doc.groupBy("len_b", "surp_b").agg(
        F.count("*").cast("bigint").alias("n_docs")
    ).select(
        F.col("len_b").alias("len_bucket"),
        F.col("surp_b").alias("surp_bucket"),
        "n_docs",
    )


# --------------------------------------------------------------------------
# Heaps'-law vocabulary growth curve (corpus-size planning)
# --------------------------------------------------------------------------

HEAPS_MARKS = (10, 50, 100)  # corpus prefixes, percent of max doc_id

_HEAPS_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), mx AS (
        SELECT MAX(doc_id) AS maxid FROM documents
    ), firsts AS (
        SELECT w, MIN(doc_id) AS first_doc, COUNT(*) AS n FROM w GROUP BY w
    ), marks AS (
        SELECT unnest([{", ".join(str(m) for m in HEAPS_MARKS)}]) AS pct
    )
    SELECT CAST(m.pct AS BIGINT) AS pct,
           CAST(SUM(CASE WHEN f.first_doc * 100 <= m.pct * x.maxid
                    THEN 1 ELSE 0 END) AS BIGINT) AS vocab,
           CAST((SELECT SUM(CASE WHEN w.doc_id * 100 <= m.pct * x.maxid
                            THEN 1 ELSE 0 END) FROM w) AS BIGINT) AS tokens
    FROM marks m CROSS JOIN mx x CROSS JOIN firsts f
    GROUP BY m.pct, x.maxid
"""


@declared("q_heaps_law", oracle=_HEAPS_ORACLE)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: distinct-word count vs token
    count at growing corpus prefixes (by doc_id) — the curve that predicts
    how much NEW vocabulary the next 10× of crawl will bring, which sizes
    tokenizer vocabularies and OOV budgets before the data exists.

    The distributed trick: no prefix is ever re-scanned — each word's
    FIRST-APPEARANCE doc_id is one aggregate, and "vocabulary at prefix P"
    is then a conditional count over the vocabulary-sized firsts table
    (first_doc·100 <= pct·max_id, integer cross-multiplication). Token
    counts per prefix are conditional sums over the same single explode.

    Scale notes (100 TB): one corpus explode; the firsts table is
    vocabulary-sized; every prefix evaluates as a conditional aggregate —
    adding marks costs nothing corpus-sized."""
    t = load_tables(spark, sf_dir)
    w = t.documents.select("doc_id", F.explode(words_col("text")).alias("w")).persist()
    mx = t.documents.agg(F.max("doc_id").alias("maxid"))
    firsts = w.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    marks = spark.range(1).select(
        F.explode(F.array(*[F.lit(m) for m in HEAPS_MARKS])).alias("pct")
    )
    vocab = (
        F.broadcast(marks)
        .crossJoin(F.broadcast(mx))
        .crossJoin(firsts)
        .groupBy("pct", "maxid")
        .agg(
            F.sum(
                F.when(F.expr("first_doc * 100 <= pct * maxid"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("vocab")
        )
    )
    tokens = (
        F.broadcast(marks)
        .crossJoin(F.broadcast(mx))
        .crossJoin(w)
        .groupBy("pct")
        .agg(
            F.sum(F.when(F.expr("doc_id * 100 <= pct * maxid"), 1).otherwise(0))
            .cast("bigint")
            .alias("tokens")
        )
    )
    return (
        vocab.join(tokens, "pct")
        .select(F.col("pct").cast("bigint").alias("pct"), "vocab", "tokens")
    )


# --------------------------------------------------------------------------
# Language-ID confusion matrix (the eval harness for q_lang_id)
# --------------------------------------------------------------------------

_LANG_CONFUSION_ORACLE = f"""
    WITH scored AS (
        SELECT lang,
               LEN(LIST_FILTER(string_split(text, ' '),
                   w -> w IN ({", ".join(repr(m) for m in MARKERS_EN)}))) AS score_en,
               LEN(LIST_FILTER(string_split(text, ' '),
                   w -> w IN ({", ".join(repr(m) for m in MARKERS_QUERY)}))) AS score_q
        FROM documents
    ), pred AS (
        SELECT lang,
               CASE WHEN score_en >= 3 THEN 'en'
                    WHEN score_q > score_en THEN 'qlang'
                    ELSE 'unknown' END AS pred_lang
        FROM scored
    ), tot AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang FROM pred GROUP BY lang
    )
    SELECT p.lang, p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           t.n_lang,
           COUNT(*) * 1e0 / t.n_lang AS frac_of_lang,
           CAST(CASE WHEN p.lang = p.pred_lang THEN 1 ELSE 0 END AS BIGINT) AS is_hit
    FROM pred p JOIN tot t ON p.lang = t.lang
    GROUP BY p.lang, p.pred_lang, t.n_lang
"""


@declared("q_lang_confusion", oracle=_LANG_CONFUSION_ORACLE)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the language-ID heuristic: declared lang ×
    predicted lang with per-cell counts and row-normalized fractions — the
    eval readout that turns q_lang_id from a classifier into a MEASURED
    classifier (which languages it confuses, and at what rate, is what
    decides whether its routing is safe to act on). The same matrix shape
    serves any cheap-model-vs-label audit in the pipeline.

    Engine-exactness: the prediction rule is q_lang_id's exact CASE chain
    over integer marker counts; one 1e0 division per cell.

    Scale notes (100 TB): narrow scoring projection (codegen'd list
    filters) → one combiner aggregate to the languages² matrix; the
    per-language totals broadcast back."""
    t = load_tables(spark, sf_dir)
    en_list = ", ".join(repr(m) for m in MARKERS_EN)
    q_list = ", ".join(repr(m) for m in MARKERS_QUERY)
    score_en = F.expr(f"size(filter(split(text, ' '), w -> w IN ({en_list})))")
    score_q = F.expr(f"size(filter(split(text, ' '), w -> w IN ({q_list})))")
    pred = t.documents.select(
        "lang",
        (
            F.when(score_en >= 3, "en")
            .when(score_q > score_en, "qlang")
            .otherwise("unknown")
        ).alias("pred_lang"),
    )
    tot = pred.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_lang"))
    return (
        pred.groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n"))
        .join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "pred_lang",
            "n",
            "n_lang",
            F.expr("n * 1e0 / n_lang").alias("frac_of_lang"),
            F.when(F.col("lang") == F.col("pred_lang"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_hit"),
        )
    )


# --------------------------------------------------------------------------
# Zipf-slope fit over the word-frequency distribution (planner statistics)
# --------------------------------------------------------------------------

ZIPF_TOP = 64  # fit over the top-64 words (deterministic (freq desc, word) rank)

_ZIPF_ORACLE = f"""
    WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY w
    ), top AS (
        SELECT w, n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank
        FROM freq QUALIFY rank <= {ZIPF_TOP}
    ), pts AS (
        SELECT CAST(LENGTH(bin(CAST(rank AS BIGINT))) - 1 AS BIGINT) AS x,
               CAST(LENGTH(bin(n)) - 1 AS BIGINT) AS y
        FROM top
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pts,
               CAST(SUM(x) AS BIGINT) AS sum_x,
               CAST(SUM(y) AS BIGINT) AS sum_y,
               CAST(SUM(x * y) AS BIGINT) AS sum_xy,
               CAST(SUM(x * x) AS BIGINT) AS sum_xx
        FROM pts
    )
    SELECT n_pts, sum_x, sum_y,
           CAST(n_pts * sum_xy - sum_x * sum_y AS BIGINT) AS slope_num,
           CAST(n_pts * sum_xx - sum_x * sum_x AS BIGINT) AS slope_den,
           (n_pts * sum_xy - sum_x * sum_y) * 1e0
               / NULLIF(n_pts * sum_xx - sum_x * sum_x, 0) AS slope
    FROM s
"""


@declared("q_zipf_slope", oracle=_ZIPF_ORACLE)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law slope of the corpus word-frequency distribution — the
    third planner statistic next to q_heaps_law (vocabulary growth) and
    q_column_profile: a healthy natural-language corpus fits
    freq ∝ rank^s with s ≈ −1; |s| ≪ 1 flags templated/synthetic text,
    |s| ≫ 1 flags a boilerplate-dominated head. Fit is OLS over
    (floor(log2 rank), floor(log2 freq)) for the top-{64} words.

    Engine-exact trick: ln() is banned cross-engine, so both logs are the
    integer bit-length identity (floor(log2 n) == LENGTH(bin(n)) − 1, the
    q_surprisal idiom); the OLS slope is then a ratio of two exact BIGINTs
    (n·Σxy − ΣxΣy) / (n·Σx² − (Σx)²), emitted as both integers and their
    one-division double. Rank ties break on the word itself — a total
    order, so both engines rank identically.

    Scale notes (100 TB): word counting is the canonical map-side-combine
    aggregate; the rank window runs on a {64}-row TakeOrdered result, never
    the full vocabulary; the fit is a single-row combiner aggregate."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    freq = (
        t.documents.select(F.explode(words_col("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    top = (
        freq.orderBy(F.col("n").desc(), "w")
        .limit(ZIPF_TOP)
        .select(
            "n",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "w"))
            .cast("bigint")
            .alias("rank"),
        )
    )
    pts = top.select(
        (F.length(F.bin("rank")) - 1).cast("bigint").alias("x"),
        (F.length(F.bin("n")) - 1).cast("bigint").alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("bigint").alias("n_pts"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum("y").cast("bigint").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_xx"),
    )
    return s.select(
        "n_pts",
        "sum_x",
        "sum_y",
        (F.col("n_pts") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y"))
        .cast("bigint")
        .alias("slope_num"),
        (F.col("n_pts") * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x"))
        .cast("bigint")
        .alias("slope_den"),
        F.expr(
            "(n_pts * sum_xy - sum_x * sum_y) * 1e0"
            " / NULLIF(n_pts * sum_xx - sum_x * sum_x, 0)"
        ).alias("slope"),
    )
