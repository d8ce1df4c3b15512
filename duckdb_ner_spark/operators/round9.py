"""Round-9 operators: bucketed MIN/MAX maintenance under deletes — the
retraction case q_incr_agg_delete documents as non-retractable for plain
partials, closed here with the standard two-level answer (VERDICT r8 #7).

Beyond-reference surface (SURVEY.md §2.D, IVM/GDPR family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import declared
from ..sources.catalog import load_tables

# Delete slice: the q_incr_agg_delete / q_erasure GDPR convention.
MINMAX_MOD = 100
MINMAX_REM = 7
MINMAX_FX = 1_000_000
MINMAX_BUCKETS = 64  # level-1 partial granularity (user_id % 64)

_MINMAX_ORACLE = f"""
    WITH base AS (
        SELECT event_type, user_id % {MINMAX_BUCKETS} AS bucket,
               CAST(ROUND(value * {MINMAX_FX}) AS BIGINT) AS fx,
               CASE WHEN user_id % {MINMAX_MOD} = {MINMAX_REM}
                    THEN 1 ELSE 0 END AS erased
        FROM events
    ), state AS (
        SELECT event_type, bucket,
               MIN(fx) AS bmin, MAX(fx) AS bmax, MAX(erased) AS dirty
        FROM base GROUP BY 1, 2
    ), dirty_recompute AS (
        SELECT b.event_type, b.bucket, MIN(b.fx) AS bmin, MAX(b.fx) AS bmax
        FROM base b JOIN state s
          ON s.event_type = b.event_type AND s.bucket = b.bucket
        WHERE s.dirty = 1 AND b.erased = 0
        GROUP BY 1, 2
    ), merged AS (
        SELECT event_type, bucket, bmin, bmax FROM state WHERE dirty = 0
        UNION ALL
        SELECT event_type, bucket, bmin, bmax FROM dirty_recompute
    ), maint AS (
        SELECT event_type, CAST(MIN(bmin) AS BIGINT) AS min_fx_maint,
               CAST(MAX(bmax) AS BIGINT) AS max_fx_maint
        FROM merged GROUP BY 1
    ), counts AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN dirty = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clean_buckets,
               CAST(SUM(dirty) AS BIGINT) AS n_dirty_buckets
        FROM state GROUP BY 1
    ), rebuild AS (
        SELECT event_type, CAST(MIN(fx) AS BIGINT) AS min_fx_rebuild,
               CAST(MAX(fx) AS BIGINT) AS max_fx_rebuild
        FROM base WHERE erased = 0 GROUP BY 1
    )
    SELECT m.event_type, c.n_clean_buckets, c.n_dirty_buckets,
           m.min_fx_maint, m.max_fx_maint,
           r.min_fx_rebuild, r.max_fx_rebuild,
           CAST(m.min_fx_maint - r.min_fx_rebuild AS BIGINT) AS min_diff,
           CAST(m.max_fx_maint - r.max_fx_rebuild AS BIGINT) AS max_diff
    FROM maint m
    JOIN counts c ON c.event_type = m.event_type
    JOIN rebuild r ON r.event_type = m.event_type
"""


@declared("q_incr_minmax", oracle=_MINMAX_ORACLE)
def q_incr_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX maintenance under DELETES via two-level bucketed partials —
    the standard answer to the boundary q_incr_agg_delete documents
    (SUM/COUNT retract by merging negated partials; MIN/MAX cannot,
    because a deleted extremum's replacement is not derivable from the
    aggregate alone). The engine keeps per-(type, user_id % {MINMAX_BUCKETS})
    min/max partials (level 1); a delete marks only the buckets holding
    retracted rows dirty, and ONLY those buckets are recomputed from
    their own raw slice — clean buckets' partials are reused verbatim —
    before the level-2 merge. The in-plan proof columns (the q_incr_join
    maintenance≡rebuild idiom) compare the maintained extrema against a
    direct rebuild over survivors: min_diff = max_diff = 0 is part of the
    hash-verified result, and the clean/dirty census quantifies the work
    saved (deletes land on user_id ≡ {MINMAX_REM} (mod {MINMAX_MOD}), so
    only residues ≡ 3 (mod 4) of the {MINMAX_BUCKETS} buckets dirty —
    ~25% recomputed, 75% reused).

    Engine-exactness: values on the ×{MINMAX_FX} fixed-point BIGINT grid;
    MIN/MAX/counts over integers; buckets from non-negative user_id
    residues (Spark % == DuckDB % there).

    Scale notes (100 TB): level-1 partials are one map-side-combined
    aggregate over the corpus (the materialized state in production);
    the delete path reads ONLY dirty buckets — on a bucket-partitioned
    layout that is partition pruning, and the recompute is proportional
    to the delete footprint, not the corpus; the level-2 merge is
    |types|×|buckets| rows. The rebuild side exists here as the audit
    ground truth."""
    t = load_tables(spark, sf_dir)
    base = t.events.select(
        "event_type",
        (F.col("user_id") % MINMAX_BUCKETS).alias("bucket"),
        F.expr(f"CAST(ROUND(value * {MINMAX_FX}) AS BIGINT)").alias("fx"),
        (F.col("user_id") % MINMAX_MOD == MINMAX_REM)
        .cast("int")
        .alias("erased"),
    )
    state = base.groupBy("event_type", "bucket").agg(
        F.min("fx").alias("bmin"),
        F.max("fx").alias("bmax"),
        F.max("erased").alias("dirty"),
    )
    dirty_keys = state.filter(F.col("dirty") == 1).select(
        F.col("event_type").alias("d_type"), F.col("bucket").alias("d_bucket")
    )
    dirty_recompute = (
        base.filter(F.col("erased") == 0)
        .join(
            F.broadcast(dirty_keys),
            (F.col("event_type") == F.col("d_type"))
            & (F.col("bucket") == F.col("d_bucket")),
        )
        .groupBy("event_type", "bucket")
        .agg(F.min("fx").alias("bmin"), F.max("fx").alias("bmax"))
    )
    merged = (
        state.filter(F.col("dirty") == 0)
        .select("event_type", "bucket", "bmin", "bmax")
        .unionByName(dirty_recompute)
    )
    maint = merged.groupBy("event_type").agg(
        F.min("bmin").cast("bigint").alias("min_fx_maint"),
        F.max("bmax").cast("bigint").alias("max_fx_maint"),
    )
    counts = state.groupBy("event_type").agg(
        F.sum((F.col("dirty") == 0).cast("int"))
        .cast("bigint")
        .alias("n_clean_buckets"),
        F.sum("dirty").cast("bigint").alias("n_dirty_buckets"),
    )
    rebuild = (
        base.filter(F.col("erased") == 0)
        .groupBy(F.col("event_type").alias("r_type"))
        .agg(
            F.min("fx").cast("bigint").alias("min_fx_rebuild"),
            F.max("fx").cast("bigint").alias("max_fx_rebuild"),
        )
    )
    return (
        maint.join(counts, "event_type")
        .join(rebuild, F.col("event_type") == F.col("r_type"))
        .select(
            "event_type",
            "n_clean_buckets",
            "n_dirty_buckets",
            "min_fx_maint",
            "max_fx_maint",
            "min_fx_rebuild",
            "max_fx_rebuild",
            (F.col("min_fx_maint") - F.col("min_fx_rebuild"))
            .cast("bigint")
            .alias("min_diff"),
            (F.col("max_fx_maint") - F.col("max_fx_rebuild"))
            .cast("bigint")
            .alias("max_diff"),
        )
    )


# --------------------------------------------------------------------------
# SemDeDup: semantic dedup via trained cells + within-cell cosine collapse
# --------------------------------------------------------------------------

SEMDEDUP_CELLS = 16  # coarse cells (K ∝ corpus size at scale)
SEMDEDUP_CELL_ITERS = 2
SEMDEDUP_TAU_FX = 350_000  # cosine ≥ 0.35 ⇒ semantic duplicate
SEMDEDUP_FX = 1_000_000


def _semdedup_oracle() -> str:
    from .pq import sql_pq_train_ctes

    return f"""
    WITH ex AS MATERIALIZED (
        SELECT vec_id, 0 AS m, i - 1 AS i,
               CAST(ROUND(CAST(x AS DOUBLE) * {SEMDEDUP_FX}) AS BIGINT) AS xi
        FROM (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
    ), {sql_pq_train_ctes("ex", 0, SEMDEDUP_CELLS, SEMDEDUP_CELL_ITERS, "sd")},
    assign AS MATERIALIZED (
        SELECT vec_id, code AS cell FROM (
            SELECT e.vec_id, cb.code,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY SUM((e.xi - cb.ci) * (e.xi - cb.ci)) ASC,
                                cb.code ASC) AS rn
            FROM ex e JOIN sd_cb{SEMDEDUP_CELL_ITERS} cb ON cb.i = e.i
            GROUP BY e.vec_id, cb.code
        ) WHERE rn = 1
    ), pairs AS MATERIALIZED (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM assign a JOIN assign b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
    ), norms AS MATERIALIZED (
        SELECT vec_id, SQRT(CAST(SUM(xi * xi) AS DOUBLE)) AS nrm
        FROM ex GROUP BY vec_id
    ), dots AS (
        SELECT p.va, p.vb, CAST(SUM(xa.xi * xb.xi) AS BIGINT) AS dot
        FROM pairs p
        JOIN ex xa ON xa.vec_id = p.va
        JOIN ex xb ON xb.vec_id = p.vb AND xb.i = xa.i
        GROUP BY 1, 2
    ), dup AS (
        SELECT d.vb
        FROM dots d
        JOIN norms na ON na.vec_id = d.va
        JOIN norms nb ON nb.vec_id = d.vb
        WHERE na.nrm > 0 AND nb.nrm > 0
          AND CAST(ROUND(CAST(d.dot AS DOUBLE) / (na.nrm * nb.nrm)
                         * {SEMDEDUP_FX}) AS BIGINT) >= {SEMDEDUP_TAU_FX}
        GROUP BY 1
    )
    SELECT CAST(a.cell AS BIGINT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(dup.vb) AS BIGINT) AS n_dropped,
           CAST((10000 * COUNT(dup.vb)) // COUNT(*) AS BIGINT) AS drop_bp
    FROM assign a LEFT JOIN dup ON dup.vb = a.vec_id
    GROUP BY 1
"""


@declared("q_semdedup", oracle=_semdedup_oracle())
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) — SEMANTIC deduplication, the
    embedding-space member of the dedup family (exact: q_dedup_exact;
    lexical near-dup: q_dedup_near/q_setsim_prefix; embedding-LSH pairs:
    q_dedup_embed; THIS: cluster-then-collapse): k-means cells from the
    round-9 trained quantizer (pq.train_pq_codebook, ONE subspace over
    all dims) bucket the corpus; within each cell every (lower-id,
    higher-id) pair is scored by exact fixed-point cosine and the
    higher id is DROPPED when cosine_fx ≥ {SEMDEDUP_TAU_FX} (the
    keep-first collapse rule of q_dedup_near, no transitive closure).
    Output is the per-cell census — members, dropped, drop rate — the
    yield forecast a semantic-dedup pass reports before a corpus-wide
    collapse (33% at sf0.1, 13% at sf0.01 at τ=0.35).

    Engine-exactness: cell training replays in-oracle (sql_pq_train_ctes);
    dots are BIGINT sums on the ×{SEMDEDUP_FX} grid; norms are SQRT of
    exact BIGINT (the one bit-exact transcendental); cosine_fx is ONE
    double divide+round — the q_sim_ivf idiom.

    Scale notes (100 TB): cells are the unit of parallelism — the
    within-cell pair join never crosses cells, and K scales with the
    corpus so cell size (and the per-cell pair count) stays constant;
    degenerate hot cells would take the caps.py bounded min-k exactly
    like the LSH buckets. The verify joins carry vectors ONCE per side
    (norms precomputed per vector, the q_sim_ann prenorm rule); the
    census is one map-side-combined aggregate."""
    from .pq import codebook_df, pq_assign_codes, train_pq_codebook

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    n = emb.count()
    ex1 = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select(
        "vec_id",
        F.lit(0).alias("m"),
        "i",
        F.expr(f"CAST(ROUND(CAST(x AS DOUBLE) * {SEMDEDUP_FX}) AS BIGINT)").alias(
            "xi"
        ),
    ).persist()
    cells = train_pq_codebook(ex1, 0, n, SEMDEDUP_CELLS, SEMDEDUP_CELL_ITERS)
    assign = pq_assign_codes(ex1, codebook_df(spark, cells)).select(
        "vec_id", F.col("code").alias("cell")
    )
    xiarr = F.expr(
        f"transform(embedding, v -> CAST(ROUND(CAST(v AS DOUBLE) * {SEMDEDUP_FX})"
        " AS BIGINT))"
    )
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(xiarr, xiarr, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda a, v: a + v,
        ).cast("double")
    )
    vecs = emb.select("vec_id", xiarr.alias("xa"), nrm.alias("na")).join(
        assign, "vec_id"
    )
    a = vecs.select(
        F.col("vec_id").alias("va"), "cell", "xa", "na"
    )
    b = vecs.select(
        F.col("vec_id").alias("vb"),
        F.col("cell").alias("cell_b"),
        F.col("xa").alias("xb"),
        F.col("na").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("xa", "xb", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    cos_fx = F.expr(
        f"CAST(ROUND(CAST(dot AS DOUBLE) / (na * nb) * {SEMDEDUP_FX}) AS BIGINT)"
    )
    dup = (
        a.join(b, (F.col("cell") == F.col("cell_b")) & (F.col("va") < F.col("vb")))
        # zero-norm guard (ADVICE r9): 0/0 is NaN in Spark but engine-
        # dependent in DuckDB — excluding degenerate all-zero embeddings
        # on BOTH sides keeps the cosine hash contract engine-exact even
        # if a future corpus contains one.
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select("va", "vb", "na", "nb", dot.alias("dot"))
        .select("vb", cos_fx.alias("cos_fx"))
        .filter(F.col("cos_fx") >= SEMDEDUP_TAU_FX)
        .select("vb")
        .distinct()
    )
    return (
        assign.join(dup, assign.vec_id == dup.vb, "left")
        .groupBy(F.col("cell").cast("bigint").alias("cell"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.count("vb").cast("bigint").alias("n_dropped"),
            F.expr("CAST((10000 * COUNT(vb)) div COUNT(*) AS BIGINT)").alias(
                "drop_bp"
            ),
        )
    )
