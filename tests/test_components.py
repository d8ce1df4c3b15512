"""Connected components / cluster collapse / IVF recall tests."""

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_connected_components_chain_and_triangle(spark):
    from duckdb_ner_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    comps = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_collapse_near_dups_keeps_representatives(spark):
    from duckdb_ner_spark.operators.components import collapse_near_dups

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], ["doc_a", "doc_b"])
    kept = sorted(r.doc_id for r in collapse_near_dups(df, pairs).collect())
    # clusters {0,1,2} -> keep 0; {4,5} -> keep 4; singleton 3 passes through
    assert kept == [0, 3, 4]


def test_collapse_on_real_corpus_reduces(spark):
    from duckdb_ner_spark.operators.components import collapse_near_dups
    from duckdb_ner_spark.operators.dedup import dedup_near_minhash

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    pairs = dedup_near_minhash(docs, threshold=0.9).select("doc_a", "doc_b")
    n_pairs = pairs.count()
    kept = collapse_near_dups(docs, pairs)
    assert n_pairs > 0
    assert kept.count() < docs.count()
    assert kept.count() >= docs.count() - n_pairs  # at most one removal per pair


def test_ivf_topk_recall_vs_exact(spark):
    from duckdb_ner_spark.operators.similarity import ivf_topk, topk_cosine

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = list(emb.filter(F.col("vec_id") == 0).head().embedding)
    rest = emb.filter(F.col("vec_id") != 0)
    exact = [r.vec_id for r in topk_cosine(rest, q, 10).collect()]
    approx = [r.vec_id for r in ivf_topk(rest, q, 10, n_probe=3).collect()]
    # ANN contract: results are a subset of the data, ranked by true cosine,
    # with nonzero overlap against exact top-10 at 3 probes
    assert len(approx) == 10
    assert len(set(approx) & set(exact)) >= 3


def test_ivf_kmeans_recovers_separable_clusters(spark):
    """Lloyd training on 3 well-separated synthetic clusters must place one
    centroid per cluster (assignment == ground-truth membership) and each
    trained centroid must land near its cluster mean — i.e. the training is
    real k-means, not a data-subset stand-in."""
    from duckdb_ner_spark.operators.similarity import ivf_assign, train_ivf_centroids

    # 3 clusters of 20 vectors around (0,0), (10,0), (0,10), deterministic jitter
    rows = []
    vid = 0
    for cx, cy in [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]:
        for j in range(20):
            rows.append((vid, [cx + (j % 5) * 0.1, cy + (j % 7) * 0.1]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>")

    cents = train_ivf_centroids(emb, k=3, n_iter=3)
    assigned = {r.vec_id: r.cent_id for r in ivf_assign(emb, centroids=cents).collect()}
    # one centroid per ground-truth cluster, no splits/merges
    groups = [set(assigned[v] for v in range(s, s + 20)) for s in (0, 20, 40)]
    assert all(len(g) == 1 for g in groups)
    assert len(set().union(*groups)) == 3
    # each trained centroid within 0.5 of its cluster mean (means are
    # (0.2, 0.3)-ish offsets from the anchors)
    import math

    anchors = [(0.2, 0.3), (10.2, 0.3), (0.2, 10.3)]
    for g, (ax, ay) in zip(groups, anchors):
        cx, cy = cents[g.pop()]
        assert math.hypot(cx - ax, cy - ay) < 0.5, (cx, cy, ax, ay)
