"""In-pytest DuckDB differential check over a representative query subset at
sf0.001 (the full corpus runs via tools/selfcheck.py / the driver's t2 gate;
this keeps a fast canary inside the test suite)."""

import duckdb
import pytest

from tests.conftest import SF_SMOKE

SUBSET = [
    "q_agg_group",
    "q_join_multi",
    "q_join_outer",
    "q_asof",
    "q_window_frame",
    "q_rollup",
    "q_subquery",
    "q_array",
    "q_json",
    "q_dedup_near",
    "q_sim_topk",
    "q_sessionize",
    "q_fingerprint",
    "q_multimodal",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_matches_duckdb_oracle(spark, oracle_con, name):
    import __spark_entry__ as e
    from tools.selfcheck import normalize

    sdf = e.queries()[name](spark, SF_SMOKE).toPandas()
    odf = oracle_con.execute(e.oracle_sql()[name]).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert normalize(sdf) == normalize(odf)
