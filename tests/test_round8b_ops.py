"""Round-8b operator tests: TWA, skyline, prefix-filtered set-sim join.

Each query is hash-gated against its DuckDB oracle by selfcheck; these
tests pin the SEMANTICS against independent pure-Python recomputes (the
house pattern), so an oracle that drifted with the Spark plan in lockstep
would still be caught.
"""

from collections import defaultdict

import duckdb

import duckdb_ner_spark.operators  # noqa: F401  (registers declared queries)
from duckdb_ner_spark.plans.registry import QUERIES
from tests.conftest import SF_SMOKE


def test_skyline_equals_bruteforce_dominance(spark):
    """q_skyline's windowed plan must equal the O(n²) dominance
    definition: keep (price, size) iff no other part has price ≤ and
    size ≥ with one strict."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT CAST(ROUND(p_retailprice*100) AS BIGINT), p_size "
        f"FROM '{SF_SMOKE}/part.parquet'"
    ).fetchall()
    pts = defaultdict(int)
    for pc, s in rows:
        pts[(pc, s)] += 1
    expected = {
        (pc, s): n
        for (pc, s), n in pts.items()
        if not any(
            pc2 <= pc and s2 >= s and (pc2 < pc or s2 > s) for (pc2, s2) in pts
        )
    }
    got = {
        (r.price_cents, r.size): r.n_parts
        for r in QUERIES["q_skyline"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def _shingles(text: str, n: int = 3) -> set:
    ws = text.split(" ")
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def test_setsim_prefix_has_no_false_negatives(spark):
    """The PPJoin lemma in practice: the prefix-filtered join must return
    EXACTLY the all-pairs τ-Jaccard result — a lossy prefix (wrong ⌈τn⌉
    arithmetic, wrong global order, wrong length filter) shows up as a
    missing pair here."""
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    sets = {d: _shingles(t) for d, t in docs if len(_shingles(t)) > 0}
    ids = sorted(sets)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and 10 * inter >= 7 * union:
                expected[(a, b)] = (inter, union, (10000 * inter) // union)
    got = {
        (r.doc_a, r.doc_b): (r.inter_sz, r.union_sz, r.jaccard_bp)
        for r in QUERIES["q_setsim_prefix"](spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert expected, "smoke corpus must contain at least one τ-similar pair"


def test_scc_groups_are_certified_mutually_reachable(spark):
    """Semantic pin, independent of the label-propagation implementation:
    rebuild the temporal digraph in Python, check (a) the reported groups
    equal a pure-Python 3-round F/B min-label recompute, and (b) every
    reported member is REALLY mutually reachable with its seed within 3
    hops (the certification the operator claims)."""
    con = duckdb.connect()
    edges = con.execute(
        "WITH fe AS (SELECT date_trunc('hour', ts) AS h, user_id, "
        "            MIN(epoch_us(ts)) AS fts "
        f"           FROM '{SF_SMOKE}/events.parquet' "
        "            WHERE ts < TIMESTAMP '2024-01-02 00:00:00' GROUP BY 1,2) "
        "SELECT DISTINCT a.user_id, b.user_id FROM fe a JOIN fe b "
        "ON a.h = b.h WHERE (a.fts, a.user_id) < (b.fts, b.user_id)"
    ).fetchall()
    out_adj, in_adj = defaultdict(set), defaultdict(set)
    nodes = set()
    for s, t in edges:
        out_adj[s].add(t)
        in_adj[t].add(s)
        nodes.update((s, t))

    def prop(adj):
        lbl = {v: v for v in nodes}
        for _ in range(3):
            lbl = {
                v: min([lbl[v]] + [lbl[u] for u in adj[v]]) for v in nodes
            }
        return lbl

    f, b = prop(in_adj), prop(out_adj)
    settled = {v: f[v] for v in nodes if f[v] == b[v]}
    groups = defaultdict(list)
    for v, m in settled.items():
        groups[m].append(v)
    expected = {
        m: (len(vs), sum(vs)) for m, vs in groups.items() if len(vs) >= 2
    }
    expected[-1] = (len(nodes) - len(settled), len(nodes))
    got = {
        r.scc_seed: (r.n_members, r.member_id_sum)
        for r in QUERIES["q_scc"](spark, SF_SMOKE).collect()
    }
    assert got == expected

    def reach(src, adj, k=3):
        seen = {src}
        frontier = {src}
        for _ in range(k):
            frontier = {w for u in frontier for w in adj[u]} - seen
            seen |= frontier
        return seen

    for v, m in settled.items():
        if v != m:
            assert v in reach(m, out_adj), (m, v)
            assert m in reach(v, out_adj), (v, m)


def test_incr_join_proof_columns_are_zero_and_full_agg_is_real(spark):
    """The in-plan maintenance≡rebuild proof must hold (diff columns all
    zero) AND the full-join side must match an independent DuckDB
    recompute — guarding against both paths drifting together."""
    con = duckdb.connect()
    expected = dict(
        con.execute(
            "SELECT o.o_orderpriority, COUNT(*) "
            f"FROM '{SF_SMOKE}/orders.parquet' o "
            f"JOIN '{SF_SMOKE}/lineitem.parquet' l "
            "ON o.o_orderkey = l.l_orderkey GROUP BY 1"
        ).fetchall()
    )
    rows = QUERIES["q_incr_join"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_diff == 0 and r.cents_diff == 0, r
        assert r.n_maint == r.n_full
        assert expected[r.o_orderpriority] == r.n_full


def test_kvtext_manifest_ignores_uncommitted_files(spark):
    """The two-phase-commit contract under test in q_sink_custom: a data
    file present in the sink directory but absent from the _committed
    manifest (a failed/speculative task attempt) must be invisible to the
    reader."""
    import json
    import os
    import tempfile
    import uuid

    from duckdb_ner_spark.sources.pydatasource import register_kvtext_source

    register_kvtext_source(spark)
    path = os.path.join(tempfile.gettempdir(), f"kvtext_test_{uuid.uuid4().hex}")
    df = spark.createDataFrame(
        [(1, "en", 10), (2, "fr", 20)], "doc_id BIGINT, lang STRING, n_chars BIGINT"
    )
    df.write.format("kvtext").option("path", path).mode("append").save()
    with open(os.path.join(path, "part-99999-stray.kv"), "w") as f:
        f.write("3\tde\t30\n")  # simulated aborted-attempt leftover
    back = spark.read.format("kvtext").option("path", path).load().collect()
    assert sorted((r.doc_id, r.lang, r.n_chars) for r in back) == [
        (1, "en", 10),
        (2, "fr", 20),
    ]
    manifest = json.load(open(os.path.join(path, "_committed")))
    assert manifest["rows"] == 2


def test_twa_equals_python_integration(spark):
    """Per-user hold-duration integration recomputed in pure Python from
    the raw events, then bucketed identically."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT user_id, event_id, epoch_us(ts), CAST(ROUND(value*100) AS BIGINT) "
        f"FROM '{SF_SMOKE}/events.parquet' "
        "WHERE ts < TIMESTAMP '2024-01-02 00:00:00'"
    ).fetchall()
    by_user = defaultdict(list)
    for uid, eid, ts_us, cents in rows:
        by_user[uid].append((ts_us, eid, cents))
    hist = defaultdict(lambda: [0, 0])
    for uid, evs in by_user.items():
        evs.sort()
        wsum = tsum = 0
        for (t0, _, c), (t1, _, _) in zip(evs, evs[1:]):
            wsum += c * (t1 - t0)
            tsum += t1 - t0
        if tsum > 0:
            twa = wsum // tsum
            hist[twa // 500][0] += 1
            hist[twa // 500][1] += twa
    expected = {b: (n, s) for b, (n, s) in hist.items()}
    got = {
        r.bucket: (r.n_users, r.twa_cents_sum)
        for r in QUERIES["q_twa"](spark, SF_SMOKE).collect()
    }
    assert got == expected
