"""Round-7 continuation operators: RLHF rejection sampling, Kneser-Ney
bigram smoothing, curriculum staging, and memorization auditing — further
LLM-pipeline operators beyond SURVEY.md §2's letter (no reference
counterpart; the reference is a 755-LoC NER extension,
src/ner_extension.cpp).

Engine-exactness follows the house rules (operators/relational.py header):
every comparison column is either an integer (fixed-point, floor division —
Spark ``div`` and DuckDB ``//`` agree on non-negatives) or a deterministic
total order; no ROUND(double, n>0), no order-dependent float folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import declared
from ..sources.catalog import load_tables

# --------------------------------------------------------------------------
# Rejection sampling (best-of-n with a reward gate, first-accept semantics)
# --------------------------------------------------------------------------

RS_TAU_CENTS = 20_000  # accept a candidate iff reward >= $200.00

_REJECTION_ORACLE = f"""
    WITH ev AS (
        SELECT event_id, user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), acc AS (
        SELECT user_id, CAST(MIN(event_id) AS BIGINT) AS first_accept_id
        FROM ev WHERE cents >= {RS_TAU_CENTS} GROUP BY user_id
    )
    SELECT e.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(CASE WHEN MIN(a.first_accept_id) IS NULL THEN 0 ELSE 1 END
                AS BIGINT) AS accepted,
           MIN(a.first_accept_id) AS first_accept_id,
           CAST(CASE WHEN MIN(a.first_accept_id) IS NULL THEN COUNT(*)
                ELSE SUM(CASE WHEN e.event_id <= a.first_accept_id
                         THEN 1 ELSE 0 END) END AS BIGINT) AS n_attempts,
           MAX(CASE WHEN e.event_id = a.first_accept_id
               THEN e.cents END) AS reward_cents
    FROM ev e LEFT JOIN acc a ON a.user_id = e.user_id
    GROUP BY e.user_id
"""


@declared("q_rejection_sampling", oracle=_REJECTION_ORACLE)
def q_rejection_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejection sampling over candidate generations (the best-of-n /
    rejection-FT collection step): each user_id is a prompt, its events are
    sampled candidates in event_id order, and the sampler keeps the FIRST
    candidate whose reward clears the gate (>= $200.00 in cents). Per
    prompt: candidate count, whether any candidate was accepted, the
    accepted candidate's id and reward, and how many samples were burned to
    get there (all of them, for never-accepted prompts) — the
    attempts-to-accept histogram is what sizes n in production best-of-n.

    First-accept differs from q_argmax/q_preference_pairs (best-of-group):
    it is an ORDER-dependent stopping rule, computed here order-free as
    min(event_id | reward >= tau) plus a count of candidates at-or-before
    that id.

    Engine-exactness: rewards quantize once to cents (ROUND half-up on an
    exact .5-free double per TESTDATA's cents quantization); everything
    after is integer counts and MIN/MAX over BIGINT. Never-accepted prompts
    carry NULL first_accept_id/reward_cents in both engines.

    Scale notes (100 TB): the accept table is one row per prompt with any
    accepted candidate — same key as the final groupBy, so the left join
    and the aggregate share one user_id exchange (co-partitioned, AQE picks
    sort-merge vs broadcast by the accept table's real size); per-prompt
    state is the candidate count only, no window, no per-row Python."""
    t = load_tables(spark, sf_dir)
    ev = t.events.select(
        "event_id", "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    acc = (
        ev.filter(F.col("cents") >= RS_TAU_CENTS)
        .groupBy("user_id")
        .agg(F.min("event_id").cast("bigint").alias("first_accept_id"))
    )
    j = ev.join(acc, "user_id", "left")
    fa = F.min("first_accept_id")
    return j.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_candidates"),
        F.when(fa.isNull(), 0).otherwise(1).cast("bigint").alias("accepted"),
        fa.alias("first_accept_id"),
        F.when(fa.isNull(), F.count("*"))
        .otherwise(
            F.sum(
                F.when(F.col("event_id") <= F.col("first_accept_id"), 1).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("n_attempts"),
        F.max(
            F.when(F.col("event_id") == F.col("first_accept_id"), F.col("cents"))
        ).alias("reward_cents"),
    )


# --------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram smoothing (exact rational fixed point)
# --------------------------------------------------------------------------

KN_SCALE = 10**6  # fixed-point scale for the smoothed probability
KN_TOP = 100

# D = 3/4 (the standard KN discount). Multiplying the interpolation
#   p(w|v) = max(c(vw) - D, 0)/c(v) + (D * N1+(v.)/c(v)) * N1+(.w)/T
# through by the common denominator 4*c(v)*T gives the all-integer form
#   p_fx = SCALE * (max(4*c(vw) - 3, 0) * T + 3 * N1+(v.) * N1+(.w))
#          // (4 * c(v) * T)

_KN_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), bg AS (
        SELECT unnest([struct_pack(v := ws[i], w := ws[i+1])
                       FOR i IN range(1, len(ws))]) AS p
        FROM d
    ), pair AS (
        SELECT p.v AS v, p.w AS w, CAST(COUNT(*) AS BIGINT) AS c_vw
        FROM bg GROUP BY 1, 2
    ), ctx AS (
        SELECT v, CAST(SUM(c_vw) AS BIGINT) AS c_v,
               CAST(COUNT(*) AS BIGINT) AS n_follow
        FROM pair GROUP BY v
    ), cont AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_precede FROM pair GROUP BY w
    ), tt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pair
    )
    SELECT p.v, p.w, p.c_vw, x.c_v, x.n_follow, c.n_precede,
           CAST(({KN_SCALE} * (GREATEST(4 * p.c_vw - 3, 0) * tt.t
                               + 3 * x.n_follow * c.n_precede))
                // (4 * x.c_v * tt.t) AS BIGINT) AS p_kn_fx
    FROM pair p
    JOIN ctx x ON x.v = p.v
    JOIN cont c ON c.w = p.w
    CROSS JOIN tt
    ORDER BY p_kn_fx DESC, p.v, p.w
    LIMIT {KN_TOP}
"""


@declared("q_kneser_ney", oracle=_KN_ORACLE)
def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram model (the classic n-gram-LM
    smoothing; Kneser & Ney 1995) over the corpus's word adjacencies:
    p(w|v) = max(c(vw)-D,0)/c(v) + lambda(v)*p_cont(w) with discount
    D = 3/4, lambda(v) = D*N1+(v.)/c(v), and the continuation probability
    p_cont(w) = N1+(.w)/T over bigram TYPES, not tokens — the property
    that distinguishes KN from plain absolute discounting. Returns the
    KN_TOP most probable smoothed bigrams with their full count profile.

    Engine-exactness: D = 3/4 is exactly rational, so multiplying through
    by the common denominator 4*c(v)*T turns the whole interpolation into
    one integer expression ending in a single floor division (Spark div ==
    DuckDB // on these non-negative operands); ORDER BY (p_fx, v, w) is a
    total order. Numerator bound: SCALE * 4*c(vw) * T — with SCALE 1e6
    this stays under 2^63 while total_bigrams * bigram_types < ~2.3e6
    (sf0.1 is ~2.5e5 * 1.6e3 = 4e8); a production run at larger vocab
    drops SCALE or widens to DECIMAL.

    Scale notes (100 TB): bigram counts are the canonical map-side-combined
    aggregate; ctx and cont derive from the pair table (no second corpus
    pass) and are vocabulary-sized, so both enrichment joins broadcast;
    the top-k is TakeOrdered, never a global sort."""
    t = load_tables(spark, sf_dir)
    ws = F.col("ws")
    m = F.size(ws) - 1
    bigrams = F.when(
        F.size(ws) >= 2,
        F.zip_with(
            F.slice(ws, 1, m), F.slice(ws, 2, m),
            lambda x, y: F.struct(x.alias("v"), y.alias("w")),
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<v:string,w:string>>)"))
    pair = (
        t.documents.select(F.split("text", " ").alias("ws"))
        .select(F.explode(bigrams).alias("p"))
        .select("p.v", "p.w")
        .groupBy("v", "w")
        .agg(F.count("*").cast("bigint").alias("c_vw"))
        .persist()  # feeds ctx, cont, T and the final join
    )
    ctx = pair.groupBy("v").agg(
        F.sum("c_vw").cast("bigint").alias("c_v"),
        F.count("*").cast("bigint").alias("n_follow"),
    )
    cont = pair.groupBy("w").agg(F.count("*").cast("bigint").alias("n_precede"))
    tt = pair.agg(F.count("*").cast("bigint").alias("t"))
    out = (
        pair.join(F.broadcast(ctx), "v")
        .join(F.broadcast(cont), "w")
        .crossJoin(F.broadcast(tt))
        .select(
            "v", "w", "c_vw", "c_v", "n_follow", "n_precede",
            F.expr(
                f"CAST(({KN_SCALE} * (GREATEST(4 * c_vw - 3, 0) * t"
                f" + 3 * n_follow * n_precede))"
                f" div (4 * c_v * t) AS BIGINT)"
            ).alias("p_kn_fx"),
        )
    )
    return out.orderBy(F.desc("p_kn_fx"), "v", "w").limit(KN_TOP)
