"""Scale-mechanism evidence: salting equivalence, bucketed shuffle-free
joins. These are the 100 TB mechanisms exercised at test scale."""

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def test_salted_agg_matches_direct(spark):
    from duckdb_ner_spark.plans.skew import salted_agg_sum

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    direct = {
        (r.l_returnflag,): (r.n, round(r.total, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum(F.col("l_quantity")), 2).alias("total"))
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, round(r.total, 2))
        for r in salted_agg_sum(li, ["l_returnflag"], "l_quantity").collect()
    }
    assert salted == direct


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Bucket both join sides on the key → SortMergeJoin with zero Exchange
    nodes: the co-located-join mechanism for 100 TB fact-fact joins."""
    import uuid

    from duckdb_ner_spark.sources.writers import write_bucketed

    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped below
    suffix = uuid.uuid4().hex[:8]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    t_orders, t_line = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    write_bucketed(orders, t_orders, "o_orderkey", n_buckets=8, sort_col="o_orderkey")
    write_bucketed(lineitem, t_line, "l_orderkey", n_buckets=8, sort_col="l_orderkey")

    # disable auto-broadcast so the join exercises the bucketed path
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_line).join(
            spark.table(t_orders), F.col("l_orderkey") == F.col("o_orderkey")
        )
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_line}")
