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

    Scale notes (100 TB): the blocking key shuffles (key, name) digests of
    the record set, never full records; since r14 the per-block scorecard
    is computed INSIDE each block's capped array row — the block self-join
    (which re-evaluated the whole cap chain per join side, Spark sharing no
    common subtrees across branches) and the n_records/pair_stats re-attach
    joins are gone; one cap chain (2 exchanges) is the entire plan. A
    production pass would follow with union-find over close pairs
    (components.py) for cluster collapse."""
    from .caps import capped_bucket_id_arrays

    t = load_tables(spark, sf_dir)
    # rec = struct(p_partkey, p_name): p_partkey is distinct, so struct
    # order == key order and the cap's min-k survivor set is EXACTLY the
    # old min-k over bare p_partkey — the name rides along so Levenshtein
    # never needs a join back to the record table.
    bands = t.part.select(
        F.lit(0).alias("band"),
        F.split("p_name", " ").getItem(0).alias("sig"),
        F.struct(F.col("p_partkey"), F.col("p_name")).alias("rec"),
    )
    blocks = capped_bucket_id_arrays(
        bands, "rec", RL_BLOCK_CAP, salt_on=F.col("rec.p_partkey")
    )
    # All i<j in-block pair distances as one array per block (sorted array
    # ⇒ i<j ⇔ key_i<key_j — the exact a<b pair set of the retired
    # self-join), then the scorecard folds out of that array: no joins.
    blocks = blocks.select(
        F.col("sig").alias("block_key"),
        F.size("__ids__").alias("n_recs_i"),
        F.expr(
            "flatten(transform(__ids__, (a, i) -> "
            "transform(slice(__ids__, i + 2, size(__ids__)), "
            "b -> levenshtein(a.p_name, b.p_name))))"
        ).alias("__d__"),
    )
    return blocks.select(
        "block_key",
        F.col("n_recs_i").cast("bigint").alias("n_records"),
        F.size("__d__").cast("bigint").alias("n_pairs"),
        F.size(F.filter("__d__", lambda d: d <= RL_CLOSE_DIST))
        .cast("bigint")
        .alias("n_close"),
        F.array_min("__d__").cast("bigint").alias("min_dist"),
    )


# --------------------------------------------------------------------------
# Poisson bootstrap: one-pass uncertainty quantification at corpus scale
# --------------------------------------------------------------------------

BOOT_B = 32  # bootstrap replicates
BOOT_FX = 10**6
# Deterministic Poisson(1) draw from the first 13 md5 hex digits (52 bits):
# k = #thresholds the uniform integer exceeds, capped at 5. The constants
# are floor(16^13 * CDF_Poisson(1)(k)) — their provenance is irrelevant to
# engine-exactness (both engines compare the SAME integer literals); what
# matters is the draw is a pure integer comparison, identical everywhere.
BOOT_THRESHOLDS = (
    1656781714176974,
    3313563428353948,
    4141954285442435,
    4418084571138597,
    4487117142562638,
)


def _boot_weight_sql(uexpr: str) -> str:
    cases = " + ".join(
        f"CASE WHEN {uexpr} >= {t} THEN 1 ELSE 0 END" for t in BOOT_THRESHOLDS
    )
    return f"({cases})"


_BOOT_ORACLE = f"""
    WITH reps AS (
        SELECT UNNEST(RANGE(0, {BOOT_B})) AS r
    ), wdocs AS (
        SELECT d.lang, d.n_chars, reps.r,
               {_boot_weight_sql(
                   "CAST(('0x' || substr(md5('boot|' || CAST(reps.r AS VARCHAR)"
                   " || '|' || CAST(d.doc_id AS VARCHAR)), 1, 13)) AS BIGINT)"
               )} AS w
        FROM documents d CROSS JOIN reps
    ), rmeans AS (
        SELECT lang, r,
               CAST(({BOOT_FX} * SUM(w * n_chars)) // SUM(w) AS BIGINT)
                   AS mean_fx
        FROM wdocs GROUP BY lang, r HAVING SUM(w) > 0
    ), point AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(({BOOT_FX} * SUM(n_chars)) // COUNT(*) AS BIGINT)
                   AS point_mean_fx
        FROM documents GROUP BY lang
    )
    SELECT p.lang, p.n_docs, p.point_mean_fx,
           CAST(COUNT(m.r) AS BIGINT) AS n_reps,
           CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY m.mean_fx)
                AS BIGINT) AS boot_p05_fx,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY m.mean_fx)
                AS BIGINT) AS boot_p50_fx,
           CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY m.mean_fx)
                AS BIGINT) AS boot_p95_fx
    FROM point p JOIN rmeans m USING (lang)
    GROUP BY p.lang, p.n_docs, p.point_mean_fx
"""


@declared("q_bootstrap_ci", oracle=_BOOT_ORACLE)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap — THE web-scale resampling scheme: classic
    bootstrap resampling needs n draws per replicate over a shared index
    (undistributable at 100 TB); the Poisson approximation gives each row
    an INDEPENDENT Poisson(1) weight per replicate, so all B replicates
    compute in ONE pass as weighted map-side-combined sums. Here: a 90%
    CI on the per-language mean document length from B={BOOT_B}
    replicates. No RNG anywhere — the weight is a deterministic integer
    comparison of the first 13 md5 hex digits (52 bits) against fixed
    Poisson-CDF thresholds, so the draw is resumable, shard-stable, and
    replayed bit-for-bit by the oracle (the md5-threshold idiom of
    q_split/q_sample_det applied to resampling).

    Engine-exactness: weights are small ints; replicate means are one
    floor division of exact BIGINT sums in 1e6 fixed point; the CI
    bounds are PERCENTILE_DISC over the B-row replicate table (actual
    data elements, no interpolation) — the only window runs over ≤B rows
    per language. HAVING SUM(w)>0 guards the (astronomically unlikely)
    all-zero replicate identically on both engines.

    Scale notes (100 TB): the replicate fan-out is a projection (each
    corpus row emits B weight terms — map work, no shuffle blowup: the
    aggregate is keyed (lang, r) with {BOOT_B}x the combiner cells of a
    plain mean, still tiny); the corpus is scanned ONCE; driver sees only
    (langs x B) means. This is the uncertainty readout every corpus-stat
    dashboard needs next to the point estimate."""
    t = load_tables(spark, sf_dir)
    reps = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("r")
    u = F.expr(
        "CAST(conv(substr(md5(concat('boot|', CAST(r AS STRING), '|',"
        " CAST(doc_id AS STRING))), 1, 13), 16, 10) AS BIGINT)"
    )
    w = sum(
        [F.when(u >= F.lit(thr), 1).otherwise(0) for thr in BOOT_THRESHOLDS],
        F.lit(0),
    )
    wdocs = t.documents.select("doc_id", "lang", "n_chars", reps).select(
        "lang", "n_chars", "r", w.alias("w")
    )
    rmeans = (
        wdocs.groupBy("lang", "r")
        .agg(
            F.sum(F.col("w") * F.col("n_chars")).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "lang",
            "r",
            F.expr(f"CAST(({BOOT_FX} * swx) div sw AS BIGINT)").alias("mean_fx"),
        )
    )
    point = t.documents.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr(f"CAST(({BOOT_FX} * SUM(n_chars)) div COUNT(*) AS BIGINT)").alias(
            "point_mean_fx"
        ),
    )
    return (
        point.join(rmeans, "lang")
        .groupBy("lang", "n_docs", "point_mean_fx")
        .agg(
            F.count("r").cast("bigint").alias("n_reps"),
            F.expr(
                "CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY mean_fx)"
                " AS BIGINT)"
            ).alias("boot_p05_fx"),
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY mean_fx)"
                " AS BIGINT)"
            ).alias("boot_p50_fx"),
            F.expr(
                "CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY mean_fx)"
                " AS BIGINT)"
            ).alias("boot_p95_fx"),
        )
    )


# --------------------------------------------------------------------------
# GDPR data-subject access report (the read-side twin of q_erasure)
# --------------------------------------------------------------------------

DSAR_MOD = 100  # subjects = customers with c_custkey % DSAR_MOD == DSAR_REM
DSAR_REM = 7

_DSAR_ORACLE = f"""
    WITH subjects AS (
        SELECT c_custkey FROM customer
        WHERE c_custkey % {DSAR_MOD} = {DSAR_REM}
    ), c AS (
        SELECT 'customer' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(c_custkey), 0) AS BIGINT) AS key_checksum,
               CAST(COALESCE(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)), 0)
                    AS BIGINT) AS cents_checksum
        FROM customer JOIN subjects USING (c_custkey)
    ), o AS (
        SELECT 'orders' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) AS key_checksum,
               CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)), 0)
                    AS BIGINT) AS cents_checksum
        FROM orders JOIN subjects ON o_custkey = c_custkey
    ), l AS (
        SELECT 'lineitem' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(li.l_orderkey * 10 + li.l_linenumber), 0)
                    AS BIGINT) AS key_checksum,
               CAST(COALESCE(SUM(CAST(ROUND(li.l_extendedprice * 100) AS BIGINT)), 0)
                    AS BIGINT) AS cents_checksum
        FROM lineitem li
        JOIN orders ON li.l_orderkey = o_orderkey
        JOIN subjects ON o_custkey = c_custkey
    )
    SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l
"""


@declared("q_dsar_report", oracle=_DSAR_ORACLE)
def q_dsar_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR data-subject access report (DSAR) — the READ side of the
    compliance pair whose delete side is q_erasure: for a subject set
    (1% of customers by key residue), account every row held about them
    across the relational graph — directly keyed rows (customer), 1-hop
    (orders via o_custkey), and 2-hop (lineitem via the orders join: data
    about a subject that carries no subject key itself, the case naive
    key-grep compliance tooling misses). Per table: row count, key
    checksum, money checksum in exact cents — the inventory a controller
    must produce and the fixture an erasure pass is verified against.

    Engine-exactness: checksums are integer sums (cents via the house
    ROUND(x*100) quantization); the lineitem key folds (orderkey,
    linenumber) into one BIGINT. Scale notes (100 TB): the subject list
    is broadcast into every fact join (semi-join pushdown shape — facts
    never reshuffle); each table contributes one map-side-combined
    aggregate; the 2-hop path reuses the orders->subject projection as
    the broadcast side of the lineitem probe."""
    t = load_tables(spark, sf_dir)
    subjects = t.customer.filter(
        F.col("c_custkey") % DSAR_MOD == DSAR_REM
    ).select("c_custkey")
    cents = lambda c: F.round(F.col(c) * 100).cast("bigint")  # noqa: E731

    def report(df: DataFrame, name: str, key: F.Column, money: F.Column) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.coalesce(F.sum(key), F.lit(0)).cast("bigint").alias("key_checksum"),
            F.coalesce(F.sum(money), F.lit(0))
            .cast("bigint")
            .alias("cents_checksum"),
        )

    c = report(
        t.customer.join(F.broadcast(subjects), "c_custkey"),
        "customer",
        F.col("c_custkey"),
        cents("c_acctbal"),
    )
    subj_orders = t.orders.join(
        F.broadcast(subjects), F.col("o_custkey") == F.col("c_custkey")
    )
    o = report(subj_orders, "orders", F.col("o_orderkey"), cents("o_totalprice"))
    li = t.lineitem.join(
        F.broadcast(subj_orders.select("o_orderkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    l_ = report(
        li,
        "lineitem",
        F.col("l_orderkey") * 10 + F.col("l_linenumber"),
        cents("l_extendedprice"),
    )
    return c.unionAll(o).unionAll(l_)


# --------------------------------------------------------------------------
# Retraction-aware incremental aggregate maintenance (the delete path)
# --------------------------------------------------------------------------

RETRACT_MOD = 100  # erased subjects: user_id % RETRACT_MOD == RETRACT_REM
RETRACT_REM = 7
RETRACT_FX = 1_000_000

_RETRACT_ORACLE = f"""
    SELECT event_type,
           CAST(SUM(CASE WHEN user_id % {RETRACT_MOD} <> {RETRACT_REM}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN user_id % {RETRACT_MOD} <> {RETRACT_REM}
                         THEN CAST(ROUND(value * {RETRACT_FX}) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS total_fx,
           CAST(SUM(CASE WHEN user_id % {RETRACT_MOD} = {RETRACT_REM}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_retracted,
           CAST(SUM(CASE WHEN user_id % {RETRACT_MOD} = {RETRACT_REM}
                         THEN CAST(ROUND(value * {RETRACT_FX}) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS retracted_fx
    FROM events
    GROUP BY event_type
    HAVING SUM(CASE WHEN user_id % {RETRACT_MOD} <> {RETRACT_REM}
                    THEN 1 ELSE 0 END) > 0
"""


@declared("q_incr_agg_delete", oracle=_RETRACT_ORACLE)
def q_incr_agg_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance under DELETES — the retraction
    path that completes the GDPR family (q_erasure prunes the dedup
    index, q_dsar_report inventories the subject's rows, THIS maintains
    the derived aggregates after the rows go): the engine takes the FULL
    materialized per-type state and merges NEGATED partials of the erased
    subjects' events (counts and fixed-point sums subtract; types whose
    count reaches zero drop out), and the hash gate proves the retracted
    state equals the oracle's direct aggregate over survivors — the
    materialized-view delete rule (SUM/COUNT are retractable partials;
    MIN/MAX are not and would need a recompute or an ordered sketch,
    documented here as the design boundary).

    Engine-exactness: every merged quantity is a 1e6-fixed-point BIGINT
    (the q_incr_agg precedent), so merge order — full-state-minus-deletes
    vs one pass — cannot drift an ulp.

    Scale notes (100 TB): the erased-subject partials aggregate only the
    delete slice (partition-prunable when events are user- or
    date-bucketed); the merge re-aggregates a types-sized union; no
    full-corpus recompute happens on the delete path — exactly why
    production view maintenance keeps retractable partials."""
    t = load_tables(spark, sf_dir)
    fx = F.expr(f"CAST(ROUND(value * {RETRACT_FX}) AS BIGINT)")
    erased = F.col("user_id") % RETRACT_MOD == RETRACT_REM

    full_state = t.events.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(fx).cast("bigint").alias("total_fx"),
        F.lit(0).cast("bigint").alias("n_retracted"),
        F.lit(0).cast("bigint").alias("retracted_fx"),
    )
    retract = t.events.filter(erased).groupBy("event_type").agg(
        (-F.count("*")).cast("bigint").alias("n_events"),
        (-F.sum(fx)).cast("bigint").alias("total_fx"),
        F.count("*").cast("bigint").alias("n_retracted"),
        F.sum(fx).cast("bigint").alias("retracted_fx"),
    )
    return (
        full_state.unionByName(retract)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("total_fx").cast("bigint").alias("total_fx"),
            F.sum("n_retracted").cast("bigint").alias("n_retracted"),
            F.sum("retracted_fx").cast("bigint").alias("retracted_fx"),
        )
        .filter(F.col("n_events") > 0)
    )


# --------------------------------------------------------------------------
# k-core peeling (iterative node removal — the fifth graph primitive)
# --------------------------------------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 3

_PEEL_GRAPH_CTE = """co AS (
        SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
        FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
    ), edges AS (
        SELECT DISTINCT a.user_id AS u, b.user_id AS v
        FROM co a JOIN co b ON a.h = b.h AND a.user_id < b.user_id
    )"""


def _kcore_oracle() -> str:
    k = KCORE_K
    ctes = [
        _PEEL_GRAPH_CTE,
        """alive0 AS (
        SELECT u AS node FROM edges UNION SELECT v FROM edges
    )""",
    ]
    stats = []
    for i in range(1, KCORE_ROUNDS + 1):
        ctes.append(f"""e{i} AS (
        SELECT u, v FROM edges
        WHERE u IN (SELECT node FROM alive{i - 1})
          AND v IN (SELECT node FROM alive{i - 1})
    ), d{i} AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT u AS node FROM e{i} UNION ALL SELECT v FROM e{i}
        ) GROUP BY node
    ), alive{i} AS (
        SELECT node FROM d{i} WHERE deg >= {k}
    )""")
        stats.append(f"""
    SELECT CAST({i} AS BIGINT) AS round,
           CAST((SELECT COUNT(*) FROM alive{i}) AS BIGINT) AS n_alive,
           CAST((SELECT COUNT(*) FROM e{i}) AS BIGINT) AS n_edges_in,
           CAST((SELECT COALESCE(SUM(node), 0) FROM alive{i}) AS BIGINT)
               AS alive_id_sum""")
    return "WITH " + ", ".join(ctes) + " UNION ALL ".join(stats)


@declared("q_kcore", oracle=_kcore_oracle())
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by iterative PEELING — the fifth graph
    primitive after min-label (components), weighted sum (PageRank),
    argmax majority (label prop), and min-plus (BFS): here the feedback
    is node REMOVAL — each round recomputes degrees over the subgraph
    induced by survivors and drops nodes under k={KCORE_K}, the dense-core
    extraction used for community seeding and influence pruning.
    {KCORE_ROUNDS} unrolled rounds (the bounded-iteration contract of the
    PR/BFS family; a full fixpoint adds the connected-components
    convergence guard); emits the per-round census (survivors, induced
    edges, id checksum).

    Engine-exactness: integer degrees and censuses only. Scale notes
    (100 TB): each round is two semi-joins of the edge list against the
    shrinking survivor set (broadcast once survivors fit; bucketed
    co-location otherwise) + one map-side-combined degree count — the
    PageRank shuffle shape; the edge list itself is the shared persisted
    day-1 graph, scanned but never reshuffled (survivor sets join on the
    same keys every round)."""
    from .components import day1_cooccurrence_graph

    edges, deg = day1_cooccurrence_graph(spark, sf_dir)
    alive = deg.select("node")
    outs = []
    for i in range(1, KCORE_ROUNDS + 1):
        # survivor set ≤ |V| — broadcast it so the induced-subgraph filter
        # is a map-side hash semi-join and the edge list never reshuffles
        # (34 s → ~8 s first-run at sf0.1; at 100 TB swap to a bucketed
        # co-located join once survivors outgrow broadcast).
        # localCheckpoint (the components.py idiom), NOT persist: e_i is
        # referenced twice by d_i and alive twice by e_{i+1}, so an
        # un-truncated lineage quadruples per round — the round-3 plan
        # STRING alone OOMs a default-heap driver session.
        e_i = (
            edges.join(
                F.broadcast(alive.withColumnRenamed("node", "u")), "u", "left_semi"
            )
            .join(
                F.broadcast(alive.withColumnRenamed("node", "v")), "v", "left_semi"
            )
            .localCheckpoint(eager=False)
        )
        d_i = (
            e_i.select(F.col("u").alias("node"))
            .unionAll(e_i.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").cast("bigint").alias("deg"))
        )
        alive = (
            d_i.filter(F.col("deg") >= KCORE_K)
            .select("node")
            .localCheckpoint(eager=False)
        )
        outs.append(
            alive.agg(
                F.lit(i).cast("bigint").alias("round"),
                F.count("*").cast("bigint").alias("n_alive"),
                F.coalesce(F.sum("node"), F.lit(0))
                .cast("bigint")
                .alias("alive_id_sum"),
            ).crossJoin(
                F.broadcast(
                    e_i.agg(F.count("*").cast("bigint").alias("n_edges_in"))
                )
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.select("round", "n_alive", "n_edges_in", "alive_id_sum")
