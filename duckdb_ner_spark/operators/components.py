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


@declared(
    "q_dedup_clusters",
    oracle="""
    WITH RECURSIVE docs AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), sh AS (
        SELECT doc_id,
               CASE WHEN len(ws) >= 3 THEN
                 list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                FOR i IN range(1, len(ws) - 1)])
               ELSE [] END AS shingles
        FROM docs
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0
              / len(list_distinct(a.shingles || b.shingles)) >= 0.6
    ), edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ), reach AS (
        -- transitive closure by recursive expansion (pair graph is tiny)
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT n.u AS node, LEAST(n.u, MIN(r.v)) AS comp
    FROM (SELECT DISTINCT u FROM edges) n
    LEFT JOIN reach r ON r.u = n.u
    GROUP BY n.u
    """,
)
def q_dedup_clusters(spark, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash-LSH pairs → iterative min-label components.
    The DuckDB oracle recomputes components via brute-force pairs + a
    recursive-CTE transitive closure — fully orthogonal implementation."""
    from .dedup import dedup_near_minhash

    t = load_tables(spark, sf_dir)
    pairs = dedup_near_minhash(t.documents, threshold=0.6).select("doc_a", "doc_b")
    return connected_components(pairs).select(
        F.col("node").cast("bigint").alias("node"), F.col("comp").cast("bigint").alias("comp")
    )
