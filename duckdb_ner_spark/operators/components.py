"""Connected components over near-duplicate pair graphs + cluster collapse
(SURVEY.md D2: "connected components via iterative join").

Algorithm: large-star/small-star style min-label propagation — every node
starts labeled with itself; each round joins labels across edges and takes
the min; stops at fixpoint. Rounds are O(log(diameter)); dup clusters have
tiny diameters (usually 1-2), so 2-3 rounds in practice.

Scale notes (100 TB): each round is one shuffle keyed on node id over the
|pairs|-sized edge list (LSH-bounded, ≪ |docs|); the driver only sees the
converged/changed COUNT (a scalar), never the data. The final collapse
(keep min-id doc per cluster) is one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.registry import declared
from ..sources.catalog import load_tables
from .textprep import sql_shingles


def connected_components(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b", max_iter: int = 20) -> DataFrame:
    """(a,b) edges → (node, component) with component = min node id reachable."""
    edges = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionAll(pairs.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .persist()
    )
    converged = False
    for _ in range(max_iter):
        # candidate label for v = min over neighbors u of label(u)
        prop = (
            edges.join(labels, edges.u == labels.node)
            .select(F.col("v").alias("node"), F.col("comp"))
            .groupBy("node")
            .agg(F.min("comp").alias("new_comp"))
        )
        updated = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("new_comp"), F.col("comp"))).alias("comp"),
            )
            .persist()
        )
        changed = (
            updated.join(labels.withColumnRenamed("comp", "old"), "node")
            .filter(F.col("comp") != F.col("old"))
            .count()
        )
        labels.unpersist()  # superseded round's cache
        labels = updated
        if changed == 0:
            converged = True
            break
    if not converged:
        # silent non-convergence would hand back WRONG labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter too large — raise max_iter)"
        )
    edges.unpersist()
    return labels.select("node", "comp")


def collapse_near_dups(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per near-dup cluster; singletons pass
    through untouched — the end-to-end near-dedup operator."""
    comps = connected_components(pairs)
    keep_ids = comps.filter(F.col("node") == F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    dup_members = comps.select(F.col("node").alias(id_col))
    survivors_in_graph = df.join(keep_ids, id_col, "left_semi")
    not_in_graph = df.join(dup_members, id_col, "left_anti")
    return survivors_in_graph.unionByName(not_in_graph)


def _clusters_oracle() -> str:
    """Oracle with IMPLEMENTATION-EQUIVALENT edges (ADVICE r1): the pairs CTE
    replays the exact md5 min-hash banding + Jaccard verify that
    dedup_near_minhash runs (same construction as q_dedup_near's oracle), so
    a borderline pair missing every LSH band is absent on BOTH sides and the
    hash gate cannot sit on the banding recall cliff. Only the closure stays
    orthogonal: recursive-CTE transitive expansion vs iterative min-label."""
    from .dedup import N_BANDS, N_HASHES

    mh_cols = ", ".join(f"MIN(md5('s{k}|' || s)) AS h{k}" for k in range(N_HASHES))
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, h{2 * b} || h{2 * b + 1} AS sig FROM mh"
        for b in range(N_BANDS)
    )
    return f"""
    WITH RECURSIVE docs AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id, {sql_shingles(3)} AS shingles FROM docs
    ), e AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), mh AS (
        SELECT doc_id, {mh_cols} FROM e GROUP BY doc_id
    ), bands AS (
        {band_union}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
    ), pairs AS (
        SELECT doc_a, doc_b
        FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
        WHERE LEN(LIST_INTERSECT(x.shingles, y.shingles)) * 1.0
              / LEN(LIST_DISTINCT(x.shingles || y.shingles)) >= 0.6
    ), edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ), reach AS (
        -- transitive closure by recursive expansion (pair graph is tiny)
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u
    )
    SELECT n.u AS node, LEAST(n.u, MIN(r.v)) AS comp
    FROM (SELECT DISTINCT u FROM edges) n
    LEFT JOIN reach r ON r.u = n.u
    GROUP BY n.u
    """


@declared("q_dedup_clusters", oracle=_clusters_oracle())
def q_dedup_clusters(spark, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash-LSH pairs → iterative min-label components.
    Edges replayed by the oracle (see _clusters_oracle); the closure itself is
    an orthogonal recursive-CTE implementation."""
    from .dedup import dedup_near_minhash

    t = load_tables(spark, sf_dir)
    pairs = dedup_near_minhash(t.documents, threshold=0.6).select("doc_a", "doc_b")
    return connected_components(pairs).select(
        F.col("node").cast("bigint").alias("node"), F.col("comp").cast("bigint").alias("comp")
    )
