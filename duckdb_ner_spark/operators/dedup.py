"""Deduplication operators for LLM-training-data pipelines (SURVEY.md §2.D
D1/D2; BASELINE.json north star). No reference implementation exists — the
designs are Spark-idiomatic and sized for 100 TB.

Operators:
- exact dedup              — content-hash groupBy           (q_dedup_exact)
- MinHash + LSH near-dedup — shingle→minhash→band→bucket    (q_dedup_near)
- n-gram inverted index    — common-shingle join + Jaccard  (q_dedup_ngram)
- SimHash                  — bitwise majority + banded hamming (q_dedup_simhash)
- embedding-cosine near-dup— normalized dot over candidates (q_dedup_embed)

Scale notes (100 TB):
- every operator is a constant number of shuffles, each keyed on a
  high-cardinality column (hash / band signature / bit-band) → AQE skew
  splitting applies; nothing collects to the driver;
- LSH/banding bounds the candidate-pair blowup: only same-bucket pairs are
  verified, and each (band, sig) bucket is CAPPED at LSH_BUCKET_CAP members
  (deterministic smallest-id survivors, replayed by the oracle) so a
  boilerplate template shared by 10^6 docs emits C(cap,2) pairs per band,
  not 10^12 — the r4-verdict hot-bucket fix;
- the Jaccard verify join carries no broadcast hint: AQE sizes the
  candidate-pair set at runtime and broadcasts it only when it actually
  fits, falling back to a shuffle join on pathological corpora;
- min-hashes here are md5-of-string MINs so the DuckDB oracle can replay
  them exactly; swap `seeded_md5` for xxhash64 at production scale (same
  plan shape, cheaper hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.exprcache import cached_exprs
from ..plans.registry import declared
from ..sources.catalog import load_tables
from .textprep import seeded_md5, shingles_expr, sql_shingles, words_col

# ---------------------------------------------------------------------------
# library operators (DataFrame -> DataFrame)
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    """Keep one row per distinct (cols) content. Hash first so wide text
    columns shuffle as 32-byte digests, not full payloads. The digest input
    is the JSON encoding of the column struct — unambiguous under embedded
    separators and NULLs (a concat_ws hash would collide on both)."""
    h = F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])))
    w = df.withColumn("__h__", h)
    return w.dropDuplicates(["__h__"]).drop("__h__")


N_HASHES = 8
N_BANDS = 4  # 2 hashes per band

# Hot-bucket guard: a (band, sig) bucket contributes pairs only among its
# LSH_BUCKET_CAP smallest doc ids. Exact-dup template clusters are the worst
# case (identical text ⇒ identical signature in EVERY band): uncapped, a
# 10^6-doc boilerplate cluster emits ~5·10^11 candidate pairs; capped it
# emits C(64,2) ≈ 2k. Docs beyond the cap lose near-dup RECALL only against
# that one bucket's tail — run exact dedup first (q_dedup_exact) and the
# truncated members are byte-identical dups already collapsed. Deterministic
# (smallest ids survive) so the DuckDB oracle replays it bit-for-bit.
LSH_BUCKET_CAP = 64

# The two-level salted min-k cap lives in caps.py (shared with multimodal
# aHash and similarity ANN banding); re-exported here because dedup is where
# the hot-bucket guard originated and tests/docs reference it via this module.
from .caps import N_CAP_SALTS, capped_bucket_ids, sql_capped_bucket_ctes  # noqa: F401,E402


def _minhash_cols() -> list[F.Column]:
    """The N_HASHES per-row min-hash columns: array_min over a transform of
    the shingle array — a NARROW expression (no explode, no aggregation, no
    shuffle). The earlier explode→groupBy formulation carried each doc's
    full shingle array through a ~200× row blowup and a sort-heavy aggregate
    (measured 7-9 s cold at sf0.1 vs ~1 s for this form; identical values —
    same lexicographic min over the same distinct shingles). Stateless, so
    built once per JVM via exprcache."""
    return [
        F.array_min(F.transform(F.col("shingles"), lambda sh: seeded_md5(k, sh))).alias(
            f"h{k}"
        )
        for k in range(N_HASHES)
    ]


def _band_sigs_expr() -> F.Column:
    """array(concat(h0,h1), concat(h2,h3), ...) banding expression, cached."""
    per_band = N_HASHES // N_BANDS
    return F.array(
        *[
            F.concat(*[F.col(f"h{b * per_band + r}") for r in range(per_band)])
            for b in range(N_BANDS)
        ]
    )


def sql_minhash_capped_cand() -> str:
    """The oracle-side MinHash→bands→capped→cand CTE chain, as ONE shared
    fragment (r5 review: it was copy-pasted into four oracles — a cap or
    banding change must land in every replay or the oracles silently
    diverge). Expects a preceding CTE ``e(doc_id, s)`` of exploded
    shingles; defines mh / bands / capped / cand."""
    mh_cols = ", ".join(f"MIN(md5('s{k}|' || s)) AS h{k}" for k in range(N_HASHES))
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, h{2 * b} || h{2 * b + 1} AS sig FROM mh"
        for b in range(N_BANDS)
    )
    return f"""mh AS (
        SELECT doc_id, {mh_cols} FROM e GROUP BY doc_id
    ), bands AS (
        {band_union}
    ), {sql_capped_bucket_ctes("bands", "doc_id", LSH_BUCKET_CAP)}, cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM capped a JOIN capped b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
    )"""


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, bucket_cap: int = LSH_BUCKET_CAP
) -> DataFrame:
    """Band the signatures and self-join per (band, signature) bucket,
    keeping only each bucket's `bucket_cap` smallest ids as pair sources
    (the hot-bucket guard — see LSH_BUCKET_CAP). The cap is the BOUNDED-
    STATE two-level salted min-k aggregate (capped_bucket_ids, VERDICT r6
    #2) — still an aggregate, not a row_number window: the window form's
    full sort-shuffle of every band row was the r5 q_dedup_near +45% steady
    regression. Selected ids are identical to the one-level form by
    construction (the `cap` smallest per bucket), so hashes — and the
    oracle replay in sql_minhash_capped_cand — are unchanged; what changed
    is worst-case aggregation state, now max(|bucket|/N_CAP_SALTS,
    N_CAP_SALTS·cap) instead of the whole bucket in one buffer, so a corpus
    that CANNOT pre-dedup (the exact-dup prerequisite) no longer risks an
    executor OOM on a 10⁶-member template bucket.

    Banding uses ONE posexplode pass, not a per-band union — Spark does not
    dedupe common subtrees across union branches, so the union form would
    recompute the minhash aggregation N_BANDS times. Pairs are generated
    from each bucket's capped id ARRAY (bucket_array_pairs) rather than a
    bucket self-join: the join form re-evaluated the entire banding+cap
    aggregation chain once per join side (r13 plan audit) — identical pair
    set, two aggregation subtrees and one join fewer."""
    from .caps import bucket_array_pairs, capped_bucket_id_arrays

    band_expr = cached_exprs("minhash_band_sigs", _band_sigs_expr)
    bands = sigs.select(F.col(id_col), F.posexplode(band_expr).alias("band", "sig"))
    if bucket_cap is None:
        a = bands.select(F.col(id_col).alias("doc_a"), "band", "sig")
        b = bands.select(F.col(id_col).alias("doc_b"), "band", "sig")
        return (
            a.join(b, ["band", "sig"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
    buckets = capped_bucket_id_arrays(bands, id_col, bucket_cap)
    return bucket_array_pairs(buckets, "doc_a", "doc_b")


def jaccard_verify(
    pairs: DataFrame, docs: DataFrame, id_col: str, shingle_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard on candidate pairs only (the LSH contract).

    No broadcast hint on the pair set: candidate pairs are LSH-bounded and
    USUALLY tiny vs |docs|, but "usually" is not a memory-safety contract —
    AQE sizes the pair set at runtime after its producing shuffle and
    broadcasts it only when it fits spark.sql.autoBroadcastJoinThreshold,
    falling back to a shuffle join otherwise (the r4-verdict fix for the
    unconditional F.broadcast driver-OOM hazard)."""
    x = docs.select(F.col(id_col).alias("doc_a"), F.col(shingle_col).alias("sh_a"))
    y = docs.select(F.col(id_col).alias("doc_b"), F.col(shingle_col).alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter * F.lit(1.0) / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_near_minhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", threshold: float = 0.6
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → (doc_a, doc_b, jaccard).

    The shingled form feeds THREE consumers (signatures + both verify
    sides): persist it so shingling runs once. Partitioning is inherited
    from the source scan (the catalog's parallelism floor locally; natural
    maxPartitionBytes-sized splits at cluster scale — an explicit
    repartition(defaultParallelism) here would both add a shuffle and force
    cores-count partitions onto a 100 TB corpus, i.e. multi-GB partitions).
    At cluster scale the persisted form's equivalent is a bucketed
    intermediate table.

    Docs with no shingles (< n words) carry no signature and can never be
    candidates — filtered up front (also keeps NULL band sigs out of the
    bucket join)."""
    docs = (
        df.select(id_col, words_col(text_col).alias("ws"))
        .select(id_col, cached_exprs("shingles_ws3", shingles_expr).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
    # One narrow pass: signature AND the shingle array for Jaccard verify in
    # the same persisted frame — per-row expressions, zero pre-join shuffles.
    sigsh = docs.select(id_col, "shingles", *cached_exprs("minhash_cols", _minhash_cols)).persist()
    cand = lsh_candidate_pairs(sigsh, id_col)
    return jaccard_verify(cand, sigsh.select(id_col, "shingles"), id_col, "shingles", threshold)


def minhash_bands(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """LSH bucket memberships (id, band, sig) — the persistent corpus index
    for incremental dedup. Stored bucketed/partitioned by (band, sig) at
    production scale so probes are co-located joins."""
    docs = (
        df.select(id_col, words_col(text_col).alias("ws"))
        .select(id_col, cached_exprs("shingles_ws3", shingles_expr).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
    sigs = docs.select(id_col, *cached_exprs("minhash_cols", _minhash_cols))
    band_expr = cached_exprs("minhash_band_sigs", _band_sigs_expr)
    return sigs.select(F.col(id_col), F.posexplode(band_expr).alias("band", "sig"))


def dedup_incremental(
    new_docs: DataFrame,
    corpus_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Continuous-ingest near-dedup: admit only new docs whose every LSH band
    misses the existing corpus index; return (survivors, survivor_bands) —
    union survivor_bands into the index for the next batch.

    Semantics: a band collision = near-dup candidate = rejected (recall-
    oriented, the cheap filter a crawl pipeline wants; add jaccard_verify on
    the collisions to trade recall for precision). Within-batch duplicates
    are NOT collapsed here — run dedup_near_minhash on the batch first.

    Scale notes (100 TB): the corpus never rescans — the probe is one
    equi-join of the new batch's bands against the (band, sig)-keyed index;
    state lives in the index table, not on the driver; index growth is
    O(N_BANDS) rows per admitted doc."""
    nb = minhash_bands(new_docs, id_col, text_col).persist()
    hit_ids = (
        nb.join(corpus_bands.select("band", "sig").distinct(), ["band", "sig"])
        .select(id_col)
        .distinct()
    )
    survivors = new_docs.join(hit_ids, id_col, "left_anti")
    survivor_bands = nb.join(hit_ids, id_col, "left_anti")
    return survivors, survivor_bands


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """63-bit SimHash: per-word xxhash64, per-bit majority vote, reassembled
    JVM-side (explode over 63 bit positions — fully distributed; swap for a
    pandas UDF at extreme scale to cut the 63× row blowup)."""
    w = (
        df.select(id_col, F.explode(words_col(text_col)).alias("w"))
        .withColumn("h", F.xxhash64("w"))
    )
    bits = w.select(
        id_col, "h", F.explode(F.sequence(F.lit(0), F.lit(62))).alias("b")
    ).withColumn(
        # shiftright/shiftleft builtins take a literal count; expr() allows a
        # column-valued shift
        "vote",
        F.expr("CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END"),
    )
    return (
        bits.groupBy(id_col, "b")
        .agg(F.sum("vote").alias("v"))
        .groupBy(id_col)
        .agg(F.sum(F.expr("CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END")).alias("simhash"))
    )


def simhash_md5(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash whose bits come from the first 15 hex chars of
    md5(word) — engine-portable (the DuckDB oracle replays it exactly), same
    plan shape as simhash64: per-word hash, per-bit majority vote, JVM-side
    reassembly. Production corpora should prefer simhash64 (xxhash64 is one
    codegen'd instruction vs md5's digest); this form exists so the declared
    query is differential-testable."""
    w = (
        df.select(id_col, F.explode(words_col(text_col)).alias("w"))
        .withColumn("hx", F.md5("w"))
    )
    bits = w.select(
        id_col, "hx", F.explode(F.sequence(F.lit(0), F.lit(59))).alias("b")
    ).withColumn(
        # bit b (MSB-first over the first 15 hex chars): nibble = hex char
        # b div 4, bit within nibble = 3 - b % 4
        "vote",
        F.expr(
            "CASE WHEN (CAST(conv(substr(hx, 1 + b DIV 4, 1), 16, 10) AS INT)"
            " >> (3 - b % 4)) & 1 = 1 THEN 1 ELSE -1 END"
        ),
    )
    return (
        bits.groupBy(id_col, "b")
        .agg(F.sum("vote").alias("v"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), 59 - b)"
                    " ELSE CAST(0 AS BIGINT) END"
                )
            ).alias("simhash")
        )
    )


def simhash_near_pairs(
    sim: DataFrame, id_col: str, max_hamming: int = 8, band_bits: int = 16
) -> DataFrame:
    """Banded hamming search: 4 bands of band_bits; a pair within distance d
    collides on ≥1 band when d < 4 (pigeonhole)."""
    sim = sim.persist()  # consumed by both sides of the band self-join
    keys = [
        F.shiftright(F.col("simhash"), b * band_bits).bitwiseAND(F.lit((1 << band_bits) - 1))
        for b in range(4)
    ]
    bands = sim.select(
        F.col(id_col), F.col("simhash"), F.posexplode(F.array(*keys)).alias("band", "key")
    )
    a = bands.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "key")
    b = bands.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "key")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# declared queries
# ---------------------------------------------------------------------------


@declared(
    "q_dedup_exact",
    oracle="""
    SELECT COUNT(*) AS n_total,
           COUNT(DISTINCT md5(text)) AS n_unique,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups
    FROM documents
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup accounting over the content hash (D1). The operator
    itself is dedup_exact(); counts keep the result hashable."""
    t = load_tables(spark, sf_dir)
    h = F.md5(F.col("text"))
    return t.documents.agg(
        F.count("*").alias("n_total"),
        F.countDistinct(h).alias("n_unique"),
        (F.count("*") - F.countDistinct(h)).alias("n_dups"),
    )


@declared(
    "q_dedup_near",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id, {sql_shingles(3)} AS shingles FROM docs
    ), e AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), {sql_minhash_capped_cand()}
    SELECT doc_a, doc_b,
           LEN(LIST_INTERSECT(x.shingles, y.shingles)) * 1.0
             / LEN(LIST_DISTINCT(x.shingles || y.shingles)) AS jaccard
    FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
    WHERE LEN(LIST_INTERSECT(x.shingles, y.shingles)) * 1.0
             / LEN(LIST_DISTINCT(x.shingles || y.shingles)) >= 0.6
    """,
)
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dedup (D2), hash-verified against a DuckDB replay of
    the identical md5-min-hash construction."""
    t = load_tables(spark, sf_dir)
    return dedup_near_minhash(t.documents, threshold=0.6)


@declared(
    "q_dedup_incr",
    oracle="""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id, CASE WHEN len(ws) >= 3 THEN list_distinct([ws[i+0] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]) ELSE [] END AS shingles FROM docs
    ), e AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), mh AS (
        SELECT doc_id, MIN(md5('s0|' || s)) AS h0, MIN(md5('s1|' || s)) AS h1, MIN(md5('s2|' || s)) AS h2, MIN(md5('s3|' || s)) AS h3, MIN(md5('s4|' || s)) AS h4, MIN(md5('s5|' || s)) AS h5, MIN(md5('s6|' || s)) AS h6, MIN(md5('s7|' || s)) AS h7
        FROM e GROUP BY doc_id
    ), bands AS (
        SELECT doc_id, 0 AS band, h0 || h1 AS sig FROM mh UNION ALL SELECT doc_id, 1 AS band, h2 || h3 AS sig FROM mh UNION ALL SELECT doc_id, 2 AS band, h4 || h5 AS sig FROM mh UNION ALL SELECT doc_id, 3 AS band, h6 || h7 AS sig FROM mh
    ), corpus AS (
        SELECT DISTINCT band, sig FROM bands WHERE doc_id % 2 = 0
    ), hits AS (
        SELECT DISTINCT b.doc_id
        FROM bands b JOIN corpus c ON b.band = c.band AND b.sig = c.sig
        WHERE b.doc_id % 2 = 1
    )
    SELECT doc_id FROM documents
    WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM hits)
    """,
)
def q_dedup_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup as a verifiable query: even doc_ids form the
    indexed corpus, odd doc_ids arrive as the new batch; admitted survivors
    are the batch docs with zero LSH band collisions against the corpus
    index. DuckDB replays the identical md5 min-hash banding."""
    t = load_tables(spark, sf_dir)
    corpus = t.documents.filter(F.col("doc_id") % 2 == 0)
    batch = t.documents.filter(F.col("doc_id") % 2 == 1)
    index = minhash_bands(corpus)
    survivors, _ = dedup_incremental(batch, index)
    return survivors.select("doc_id")


NGRAM_DF_CAP = 100  # shingles present in more docs than this never index


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_common: int = 15,
    threshold: float = 0.5,
    df_cap: int = NGRAM_DF_CAP,
) -> DataFrame:
    """Inverted-shingle-index near-dup: (doc_a, doc_b, n_common, jaccard).

    Candidate generation uses ONLY shingles with document-frequency ≤
    df_cap — stop-shingles ("of the and"-style n-grams appearing in a large
    fraction of a crawl) would otherwise dominate the self-join with O(df²)
    pairs per shingle. The DF table is one map-side-combined groupBy on the
    same key the self-join shuffles on. Candidates then get an EXACT verify
    (array_intersect over the full shingle sets), so reported n_common /
    jaccard are uncapped; the cap only bounds recall (a pair whose shared
    shingles are mostly stop-shingles may fall under min_common capped hits
    — the standard index-pruning trade, replayed identically by the oracle).
    """
    docs = (
        df.select(id_col, words_col(text_col).alias("ws"))
        .select(id_col, cached_exprs("shingles_ws3", shingles_expr).alias("shingles"))
        .persist()
    )
    e = docs.select(F.col(id_col).alias("doc_id"), F.explode("shingles").alias("s"))
    # shingle arrays are distinct per doc, so count(*) per shingle == DF
    ok = e.groupBy("s").agg(F.count("*").alias("df")).filter(F.col("df") <= df_cap)
    ef = e.join(ok.select("s"), "s")
    a = ef.select(F.col("doc_id").alias("doc_a"), "s")
    b = ef.select(F.col("doc_id").alias("doc_b"), "s")
    cands = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_capped"))
        .filter(F.col("n_capped") >= min_common)
        .select("doc_a", "doc_b")
    )
    x = docs.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    y = docs.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_common * F.lit(1.0) / (F.size("sh_a") + F.size("sh_b") - n_common)
    return (
        F.broadcast(cands)
        .join(x, "doc_a")
        .join(y, "doc_b")
        .select("doc_a", "doc_b", n_common.alias("n_common"), jac.alias("jaccard"))
        .filter((F.col("jaccard") >= threshold) & (F.col("n_common") >= min_common))
    )


@declared(
    "q_dedup_ngram",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id, {sql_shingles(3)} AS shingles FROM docs
    ), e AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), ok AS (
        SELECT s FROM e GROUP BY s HAVING COUNT(*) <= {NGRAM_DF_CAP}
    ), ef AS (
        SELECT e.doc_id, e.s FROM e JOIN ok USING (s)
    ), cands AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ef a JOIN ef b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= 15
    )
    SELECT doc_a, doc_b,
           LEN(list_intersect(x.shingles, y.shingles)) AS n_common,
           LEN(list_intersect(x.shingles, y.shingles)) * 1.0
             / (LEN(x.shingles) + LEN(y.shingles)
                - LEN(list_intersect(x.shingles, y.shingles))) AS jaccard
    FROM cands JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
    WHERE LEN(list_intersect(x.shingles, y.shingles)) * 1.0
             / (LEN(x.shingles) + LEN(y.shingles)
                - LEN(list_intersect(x.shingles, y.shingles))) >= 0.5
      AND LEN(list_intersect(x.shingles, y.shingles)) >= 15
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup with a document-frequency-capped inverted
    index (cap={NGRAM_DF_CAP} docs): candidates from sub-cap shingles only,
    exact intersect/Jaccard verify on candidates. The oracle replays the
    identical cap, candidate threshold, and exact verify."""
    t = load_tables(spark, sf_dir)
    return ngram_jaccard_pairs(t.documents, min_common=15, threshold=0.5)


_SIMHASH_ORACLE = """
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), h AS (
        SELECT doc_id, md5(w) AS hx FROM words
    ), bits AS (
        SELECT doc_id, b,
               CASE WHEN ((strpos('0123456789abcdef', substr(hx, 1 + b // 4, 1)) - 1)
                          >> (3 - (b % 4))) & 1 = 1 THEN 1 ELSE -1 END AS vote
        FROM h, (SELECT unnest(range(60)) AS b)
    ), votes AS (
        SELECT doc_id, b, SUM(vote) AS v FROM bits GROUP BY doc_id, b
    ), sim AS (
        SELECT doc_id,
               SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(59 - b AS INT))
                        ELSE CAST(0 AS BIGINT) END) AS simhash
        FROM votes GROUP BY doc_id
    ), bands AS (
        SELECT doc_id, simhash, b AS band, (simhash >> CAST(b * 15 AS INT)) & 32767 AS key
        FROM sim, (SELECT unnest(range(4)) AS b)
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
                        a.simhash AS sim_a, b2.simhash AS sim_b
        FROM bands a JOIN bands b2 ON a.band = b2.band AND a.key = b2.key
        WHERE a.doc_id < b2.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
    FROM pairs
    WHERE bit_count(xor(sim_a, sim_b)) <= 8
"""


@declared("q_dedup_simhash", oracle=_SIMHASH_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates over an md5-bit SimHash (simhash_md5) so
    the DuckDB oracle replays the construction bit-for-bit: same per-word
    hash bits, same majority vote, same 4×15-bit banding, same hamming ≤ 8
    verify. The xxhash64 production variant (simhash64 — cheaper hash, same
    plan) stays golden-tested in pytest."""
    t = load_tables(spark, sf_dir)
    sim = simhash_md5(t.documents, "doc_id", "text")
    return simhash_near_pairs(sim, "doc_id", max_hamming=8, band_bits=15)


from .similarity import fx_lsh_oracle_sql, lsh_cosine_pairs  # noqa: E402


@declared("q_dedup_embed", oracle=fx_lsh_oracle_sql(dim=64, threshold=0.45))
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via banded hyperplane LSH — the 100 TB
    shape: fixed-point (integer) signed-random-projection bucketing, exact
    cosine only within a (band, sig) bucket, NO all-pairs join anywhere.
    The DuckDB oracle replays the identical bucketing (same integer plane
    literals — integer sums are order-independent, so the bucket bits are
    bit-identical across engines), then the same 6dp-rounded cosine verify.
    Threshold 0.45; candidate recall at the threshold ≈ 72% by the banding
    formula — deterministic and replayed, so the hash gate stays exact."""
    t = load_tables(spark, sf_dir)
    return lsh_cosine_pairs(t.embeddings, dim=64, threshold=0.45)


# --------------------------------------------------------------------------
# MinHash estimation quality: signature-estimated vs exact Jaccard
# --------------------------------------------------------------------------

_JACCARD_EST_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id, {sql_shingles(3)} AS shingles FROM docs
    ), e AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), {sql_minhash_capped_cand()}
    SELECT doc_a, doc_b,
           ({" + ".join(f"CASE WHEN ma.h{k} = mb.h{k} THEN 1 ELSE 0 END" for k in range(N_HASHES))}) * 1.0
             / {N_HASHES} AS est_jaccard,
           CAST((CAST(LEN(LIST_INTERSECT(x.shingles, y.shingles)) AS BIGINT) * 2000000
                 + LEN(LIST_DISTINCT(x.shingles || y.shingles)))
                // (2 * LEN(LIST_DISTINCT(x.shingles || y.shingles))) AS BIGINT)
               AS jaccard_fx
    FROM cand
    JOIN mh ma ON ma.doc_id = doc_a
    JOIN mh mb ON mb.doc_id = doc_b
    JOIN sh x ON x.doc_id = doc_a
    JOIN sh y ON y.doc_id = doc_b
"""


@declared("q_jaccard_est", oracle=_JACCARD_EST_ORACLE)
def q_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimation quality audit: for every LSH candidate pair, the
    signature-estimated Jaccard (fraction of agreeing min-hashes — the
    statistic LSH thresholds actually act on) next to the exact Jaccard.
    The production use: calibrate band/row counts from a sample before
    committing a 100 TB dedup sweep. est is a k/N_HASHES rational (exactly
    representable); exact Jaccard is 1e6 fixed point computed entirely in
    integer arithmetic — (2·inter·10^6 + union) div (2·union) is round-half-
    up with zero doubles, immune to the ROUND(double, n) cross-engine class
    (DuckDB `//` floors, Spark `div` truncates; they agree on non-negatives).
    Identical md5 min-hash construction replayed by the oracle."""
    t = load_tables(spark, sf_dir)
    docs = (
        t.documents.select("doc_id", words_col("text").alias("ws"))
        .select("doc_id", cached_exprs("shingles_ws3", shingles_expr).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
    sigsh = docs.select("doc_id", "shingles", *cached_exprs("minhash_cols", _minhash_cols)).persist()
    cand = lsh_candidate_pairs(sigsh, "doc_id")
    a = sigsh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        *[F.col(f"h{k}").alias(f"a{k}") for k in range(N_HASHES)],
    )
    b = sigsh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        *[F.col(f"h{k}").alias(f"b{k}") for k in range(N_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0) for k in range(N_HASHES)
    )
    return (
        cand  # no broadcast hint — AQE runtime-sizes it (cf. jaccard_verify)
        .join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (matches * F.lit(1.0) / N_HASHES).alias("est_jaccard"),
            F.expr(
                "CAST((CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT) * 2000000"
                " + size(array_union(sh_a, sh_b)))"
                " div (2 * size(array_union(sh_a, sh_b))) AS BIGINT)"
            ).alias("jaccard_fx"),
        )
    )


# --------------------------------------------------------------------------
# Erasure propagation through the persistent LSH index (GDPR deletion path)
# --------------------------------------------------------------------------

ERASE_STEP = 37  # every 37th doc receives an erasure request (~2.7%)

_ERASURE_BANDS_SQL = """
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id, CASE WHEN len(ws) >= 3 THEN list_distinct([ws[i+0] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]) ELSE [] END AS shingles FROM docs
    ), e AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), mh AS (
        SELECT doc_id, MIN(md5('s0|' || s)) AS h0, MIN(md5('s1|' || s)) AS h1, MIN(md5('s2|' || s)) AS h2, MIN(md5('s3|' || s)) AS h3, MIN(md5('s4|' || s)) AS h4, MIN(md5('s5|' || s)) AS h5, MIN(md5('s6|' || s)) AS h6, MIN(md5('s7|' || s)) AS h7
        FROM e GROUP BY doc_id
    ), bands AS (
        SELECT doc_id, 0 AS band, h0 || h1 AS sig FROM mh UNION ALL SELECT doc_id, 1 AS band, h2 || h3 AS sig FROM mh UNION ALL SELECT doc_id, 2 AS band, h4 || h5 AS sig FROM mh UNION ALL SELECT doc_id, 3 AS band, h6 || h7 AS sig FROM mh
    )
"""

_ERASURE_ORACLE = (
    _ERASURE_BANDS_SQL
    + f""",
    erased AS (
        SELECT doc_id FROM documents WHERE doc_id % {ERASE_STEP} = 0
    ), pruned AS (
        SELECT * FROM bands WHERE doc_id NOT IN (SELECT doc_id FROM erased)
    ), rebuilt AS (
        SELECT * FROM bands WHERE doc_id IN (
            SELECT doc_id FROM documents WHERE doc_id % {ERASE_STEP} <> 0
        )
    ), mismatch AS (
        SELECT COUNT(*) AS m FROM (
            SELECT * FROM pruned EXCEPT ALL SELECT * FROM rebuilt
            UNION ALL
            SELECT * FROM rebuilt EXCEPT ALL SELECT * FROM pruned
        )
    )
    SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs_before,
           CAST((SELECT COUNT(*) FROM documents WHERE doc_id % {ERASE_STEP} <> 0)
                AS BIGINT) AS n_docs_after,
           CAST((SELECT COUNT(*) FROM erased) AS BIGINT) AS n_erased,
           CAST((SELECT COUNT(*) FROM bands) AS BIGINT) AS n_index_before,
           CAST((SELECT COUNT(*) FROM pruned) AS BIGINT) AS n_index_after,
           CAST((SELECT m FROM mismatch) AS BIGINT) AS n_mismatch
"""
)


@declared("q_erasure", oracle=_ERASURE_ORACLE)
def q_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure propagation (the GDPR deletion path for incremental dedup):
    an erase set must disappear from the corpus AND from the persistent LSH
    band index. The operational claim this query verifies end-to-end: the
    index can be maintained by a keyed ANTI-JOIN (prune) instead of a full
    re-banding rebuild, because band rows are per-document independent —
    `n_mismatch` counts the multiset symmetric difference between the
    pruned index and a from-scratch rebuild over the surviving corpus, and
    must be 0. The audit also accounts every row (docs and index entries
    before/after).

    Scale notes (100 TB): the prune is one anti-join against a broadcast
    erase list (erasure batches are small); the rebuild path — recomputed
    here only to PROVE prune==rebuild — is exactly what the anti-join
    avoids: a full corpus re-shingle. With the index stored bucketed by
    (band, sig) (the q_dedup_incr layout), pruning rewrites only the
    buckets containing erased docs' rows."""
    t = load_tables(spark, sf_dir)
    erased = t.documents.filter(F.col("doc_id") % ERASE_STEP == 0).select("doc_id")
    survivors = t.documents.filter(F.col("doc_id") % ERASE_STEP != 0)
    index = minhash_bands(t.documents).persist()
    pruned = index.join(F.broadcast(erased), "doc_id", "left_anti").persist()
    rebuilt = minhash_bands(survivors).persist()
    # mismatch stays IN the plan (no driver-side count): multiset symmetric
    # difference via two exceptAlls unioned into a 1-row aggregate
    mismatch = (
        pruned.exceptAll(rebuilt)
        .unionAll(rebuilt.exceptAll(pruned))
        .agg(F.count("*").cast("bigint").alias("n_mismatch"))
    )
    agg = lambda df, name: df.agg(F.count("*").cast("bigint").alias(name))  # noqa: E731
    return (
        agg(t.documents, "n_docs_before")
        .crossJoin(F.broadcast(agg(survivors, "n_docs_after")))
        .crossJoin(F.broadcast(agg(erased, "n_erased")))
        .crossJoin(F.broadcast(agg(index, "n_index_before")))
        .crossJoin(F.broadcast(agg(pruned, "n_index_after")))
        .crossJoin(F.broadcast(mismatch))
    )


# --------------------------------------------------------------------------
# Train/val split leakage probe (LSH collision rate across the split)
# --------------------------------------------------------------------------

LEAK_TRAIN_HEX = "c"  # first md5 nibble < 'c' → train (75%), else val (25%)

_LEAKAGE_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS ws,
               substr(md5('leak|' || CAST(doc_id AS VARCHAR)), 1, 1) AS hv
        FROM documents
    ), sh AS (
        SELECT doc_id, hv, {sql_shingles(3)} AS shingles FROM docs
    ), e AS (
        SELECT doc_id, hv, unnest(shingles) AS s FROM sh
    ), mh AS (
        SELECT doc_id, hv,
               {", ".join(f"MIN(md5('s{k}|' || s)) AS h{k}" for k in range(N_HASHES))}
        FROM e GROUP BY doc_id, hv
    ), bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, hv, {b} AS band, h{2 * b} || h{2 * b + 1} AS sig FROM mh" for b in range(N_BANDS))}
    ), train_idx AS (
        SELECT DISTINCT band, sig FROM bands WHERE hv < '{LEAK_TRAIN_HEX}'
    ), leaky AS (
        SELECT DISTINCT b.doc_id
        FROM bands b JOIN train_idx t ON b.band = t.band AND b.sig = t.sig
        WHERE b.hv >= '{LEAK_TRAIN_HEX}'
    )
    SELECT CAST((SELECT COUNT(*) FROM docs WHERE hv < '{LEAK_TRAIN_HEX}') AS BIGINT) AS n_train,
           CAST((SELECT COUNT(*) FROM docs WHERE hv >= '{LEAK_TRAIN_HEX}') AS BIGINT) AS n_val,
           CAST((SELECT COUNT(*) FROM leaky) AS BIGINT) AS n_leaky,
           (SELECT COUNT(*) FROM leaky) * 1e0
             / (SELECT COUNT(*) FROM docs WHERE hv >= '{LEAK_TRAIN_HEX}') AS leak_ratio
"""


@declared("q_leakage", oracle=_LEAKAGE_ORACLE)
def q_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: the fraction of VAL documents whose MinHash-LSH
    signature collides with any TRAIN document's band — near-duplicate
    train→val leakage, the eval-integrity failure n-gram decontamination
    (q_decontam) misses when the overlap is paraphrase-level rather than
    verbatim. The split is the md5-threshold assignment (q_split idiom:
    growth-stable, shuffle-free).

    Scale notes (100 TB): the probe is dedup_incremental's shape — val bands
    equi-join the DISTINCT (band, sig) train index; no pair enumeration, no
    quadratic term anywhere (the per-bucket cap is a pair-GENERATION guard
    and does not apply to membership probes). 1-row audit output.

    cf. reference test strategy: no analogue (beyond-reference surface)."""
    t = load_tables(spark, sf_dir)
    hv = F.substring(
        F.md5(F.concat(F.lit("leak|"), F.col("doc_id").cast("string"))), 1, 1
    )
    docs = t.documents.withColumn("hv", hv)
    train = docs.filter(F.col("hv") < LEAK_TRAIN_HEX)
    val = docs.filter(F.col("hv") >= LEAK_TRAIN_HEX)
    train_idx = minhash_bands(train).select("band", "sig").distinct()
    leaky = (
        minhash_bands(val)
        .join(train_idx, ["band", "sig"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    cnt = lambda df, name: df.agg(F.count("*").cast("bigint").alias(name))  # noqa: E731
    return (
        cnt(train, "n_train")
        .crossJoin(F.broadcast(cnt(val, "n_val")))
        .crossJoin(F.broadcast(cnt(leaky, "n_leaky")))
        .select(
            "n_train",
            "n_val",
            "n_leaky",
            F.expr("n_leaky * 1e0 / n_val").alias("leak_ratio"),
        )
    )


# --------------------------------------------------------------------------
# Asymmetric containment (quote/subset detection the Jaccard gate misses)
# --------------------------------------------------------------------------

CONTAIN_THRESHOLD = 0.8  # max-side containment flag level

_CONTAINMENT_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id, {sql_shingles(3)} AS shingles FROM docs
    ), e AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), {sql_minhash_capped_cand()}, scored AS (
        SELECT doc_a, doc_b,
               CAST(LEN(LIST_INTERSECT(x.shingles, y.shingles)) AS BIGINT) AS inter,
               CAST(LEN(LIST_DISTINCT(x.shingles)) AS BIGINT) AS na,
               CAST(LEN(LIST_DISTINCT(y.shingles)) AS BIGINT) AS nb
        FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
    )
    SELECT doc_a, doc_b, inter, na, nb,
           inter * 1e0 / na AS cont_a,
           inter * 1e0 / nb AS cont_b
    FROM scored
    WHERE inter * 10 >= {int(CONTAIN_THRESHOLD * 10)} * LEAST(na, nb)
"""


@declared("q_containment", oracle=_CONTAINMENT_ORACLE)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment over LSH candidate pairs: |A∩B| / |A| and
    |A∩B| / |B| on DISTINCT shingle sets, flagging pairs where the SMALLER
    document is ≥{int(CONTAIN_THRESHOLD * 100)}% contained in the other.
    This is the quote/subset near-dup class symmetric Jaccard under-scores
    (a 50-word quote inside a 5000-word page has Jaccard ≈ 0.01 but
    containment ≈ 1.0) — the dedup signal for boilerplate extraction and
    quote collapse.

    Engine-exactness: the flag test is the integer cross-multiplication
    inter*10 >= 8*min(na,nb) (no threshold doubles); the reported ratios
    are single 1e0 divisions.

    Scale notes (100 TB): identical candidate discipline to q_dedup_near —
    capped buckets, AQE-sized verify joins; the containment lens adds two
    size() expressions to the same verify pass."""
    t = load_tables(spark, sf_dir)
    docs = (
        t.documents.select("doc_id", words_col("text").alias("ws"))
        .select("doc_id", cached_exprs("shingles_ws3", shingles_expr).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
    sigsh = docs.select(
        "doc_id", "shingles", *cached_exprs("minhash_cols", _minhash_cols)
    ).persist()
    pairs = lsh_candidate_pairs(sigsh, "doc_id")
    x = sigsh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    y = sigsh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    na = F.size(F.array_distinct("sh_a")).cast("bigint")
    nb = F.size(F.array_distinct("sh_b")).cast("bigint")
    return (
        pairs.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            na.alias("na"),
            nb.alias("nb"),
        )
        .filter(
            F.expr(
                f"inter * 10 >= {int(CONTAIN_THRESHOLD * 10)} * LEAST(na, nb)"
            )
        )
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "na",
            "nb",
            F.expr("inter * 1e0 / na").alias("cont_a"),
            F.expr("inter * 1e0 / nb").alias("cont_b"),
        )
    )


# --------------------------------------------------------------------------
# Cross-source shingle-overlap matrix (corpus provenance forensics)
# --------------------------------------------------------------------------

_SOURCE_OVERLAP_ORACLE = f"""
    WITH docs AS (
        SELECT source, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT source, {sql_shingles(3)} AS shingles FROM docs
    ), dg AS (
        SELECT DISTINCT source, md5(unnest(shingles)) AS d FROM sh
    ), per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM dg GROUP BY source
    ), inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM dg a JOIN dg b ON a.d = b.d AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_common, pa.n AS n_a, pb.n AS n_b,
           i.n_common * 1e0 / (pa.n + pb.n - i.n_common) AS jaccard,
           i.n_common * 1e0 / LEAST(pa.n, pb.n) AS containment
    FROM inter i
    JOIN per_src pa ON pa.source = i.src_a
    JOIN per_src pb ON pb.source = i.src_b
"""


@declared("q_source_overlap", oracle=_SOURCE_OVERLAP_ORACLE)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shingle-overlap matrix: for every source pair, the
    Jaccard and small-side containment of their DISTINCT 3-word-shingle
    digest sets — corpus provenance forensics (two "independent" crawl
    dumps with high overlap are the same upstream scrape; a high-containment
    small source is a subset mirror and its tokens are already paid for).
    The source-level twin of q_leakage's split-level probe, with exact
    overlap instead of LSH collision.

    Engine-exactness: md5 digests, BIGINT counts, two single 1e0 divisions.

    Scale notes (100 TB): shingles collapse to DISTINCT (source, digest)
    rows before any join — the overlap join is keyed on the 32-byte digest
    and each digest meets at most n_sources rows, so the worst fan-out per
    digest is n_sources², a constant; output is the sources² matrix."""
    t = load_tables(spark, sf_dir)
    dg = (
        t.documents.select("source", words_col("text").alias("ws"))
        .select("source", cached_exprs("shingles_ws3", shingles_expr).alias("shingles"))
        .select("source", F.explode("shingles").alias("s"))
        .select("source", F.md5("s").alias("d"))
        .distinct()
        .persist()  # feeds per-source counts AND both sides of the overlap join
    )
    per_src = dg.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    a = dg.select(F.col("source").alias("src_a"), "d")
    b = dg.select(F.col("source").alias("src_b"), "d")
    inter = (
        a.join(b, "d")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    pa = per_src.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    pb = per_src.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "n_a",
            "n_b",
            F.expr("n_common * 1e0 / (n_a + n_b - n_common)").alias("jaccard"),
            F.expr("n_common * 1e0 / LEAST(n_a, n_b)").alias("containment"),
        )
    )
