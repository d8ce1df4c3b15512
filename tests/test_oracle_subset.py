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
    "q_fuzzy",
    "q_array_setops",
    "q_supplier_rev",
    "q_part_margin",
    "q_domain_cap",
    "q_line_dedup",
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


def test_fixedpoint_sum_equals_decimal_sum(spark):
    """The fixed-point long fast path (operators/relational._fxsum) must be
    bit-identical to the decimal-sum slow path on arbitrary 2-decimal money
    data — negatives, NULLs, and exact .xx5 rounding midpoints included
    (products of 2-decimal values land exactly on midpoints, where double
    rounding would disagree)."""
    import numpy as np
    from pyspark.sql import functions as F

    from duckdb_ner_spark.operators.relational import _dec, _dec_rate, _fx100, _fxsum, _r2d

    rng = np.random.default_rng(7)
    price = np.round(rng.uniform(-1000, 90000, 5000), 2)
    disc = np.round(rng.uniform(0, 0.1, 5000), 2)
    rows = [
        (int(i) % 7, float(p), float(d))
        for i, (p, d) in enumerate(zip(price, disc))
    ]
    rows += [(k, None, None) for k in range(7)]  # NULL money values
    df = spark.createDataFrame(rows, "g int, price double, disc double")

    fx_rev = _fx100("price") * (F.lit(100) - _fx100("disc"))
    fast = df.groupBy("g").agg(
        _fxsum(_fx100("price"), 2).alias("s_price"),
        _fxsum(fx_rev, 4).alias("s_rev"),
    )
    dec_rev = _dec("price") * (F.lit(1).cast("decimal(4,2)") - _dec_rate("disc"))
    slow = df.groupBy("g").agg(
        _r2d(F.sum(_dec("price"))).alias("s_price"),
        _r2d(F.sum(dec_rev)).alias("s_rev"),
    )
    f = {r["g"]: (r["s_price"], r["s_rev"]) for r in fast.collect()}
    s = {r["g"]: (r["s_price"], r["s_rev"]) for r in slow.collect()}
    assert f == s  # exact double equality, every group


def test_oracle_numeric_dtype_kinds_full_registry(spark, oracle_con):
    """Driver-hash-faithful TYPE audit over the FULL oracle registry
    (VERDICT r3 #5): the r3 red rows were numerically equal but
    hash-different because DuckDB returned HUGEINT (pandas float64) where
    Spark returned LONG — a class tools/selfcheck.py's value-coercing
    comparison could not see. This test makes the class unlandable: for
    every declared oracle pair, the numeric family (int/float/bool/decimal)
    of each output column must agree between the Spark analyzed schema
    (pure driver-side — no job runs) and the DuckDB LIMIT-0 result frame
    (type mapping only — no rows scanned). Streaming queries are excluded:
    their builders drain real micro-batches (covered by the driver gate and
    tests/test_streaming.py), and the audit must stay cheap enough to run
    on every pytest."""
    import pyspark.sql.types as T

    import __spark_entry__ as e
    from tools.selfcheck import _numeric_kind

    def spark_kind(dt):
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return "int"
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return "float"
        if isinstance(dt, T.BooleanType):
            return "bool"
        if isinstance(dt, T.DecimalType):
            return "decimal"
        return None

    qs, oracles = e.queries(), e.oracle_sql()
    bad = []
    for name, sql in oracles.items():
        if name.startswith("q_stream_"):
            continue
        sdf = qs[name](spark, SF_SMOKE)
        odf = oracle_con.execute(f"SELECT * FROM ({sql}) _q LIMIT 0").df()
        skinds = {f.name: spark_kind(f.dataType) for f in sdf.schema.fields}
        for c in odf.columns:
            sk, ok = skinds.get(c), _numeric_kind(odf[c])
            if sk is not None and ok is not None and sk != ok:
                bad.append((name, c, sk, ok))
    assert not bad, f"numeric dtype-kind mismatches (driver hash would differ): {bad}"
