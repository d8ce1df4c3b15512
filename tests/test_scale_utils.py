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


class TestZOrder:
    def test_zvalue_interleave_known_bits(self, spark):
        """z(x,y) interleaves bits: x=0b11, y=0b00 → 0b0101; x=0b00,y=0b11 →
        0b1010; x=y=0b11 → 0b1111 (x occupies even positions)."""
        from pyspark.sql import functions as F

        from duckdb_ner_spark.plans.zorder import zvalue

        df = spark.createDataFrame(
            [(3, 0), (0, 3), (3, 3), (2, 1)], "x long, y long"
        )
        got = [
            r.z for r in df.select(zvalue(["x", "y"], bits=2).alias("z")).collect()
        ]
        # (2,1): x=0b10 → bits at pos 0,2 = 0,1; y=0b01 → pos 1,3 = 1,0 → 0b0110
        assert got == [0b0101, 0b1010, 0b1111, 0b0110]

    def test_zvalue_monotone_locality(self, spark):
        """Points close in (x,y) have close z-values at the quadrant level:
        the top bit pair of z identifies the quadrant."""
        from duckdb_ner_spark.plans.zorder import zvalue

        df = spark.createDataFrame(
            [(x, y) for x in range(4) for y in range(4)], "x long, y long"
        )
        rows = df.select("x", "y", zvalue(["x", "y"], bits=2).alias("z")).collect()
        for r in rows:
            quadrant = (r.x >> 1, r.y >> 1)
            z_quadrant = ((r.z >> 2) & 1, (r.z >> 3) & 1)
            assert quadrant == z_quadrant

    def test_zorder_write_tightens_rowgroup_stats(self, spark, tmp_path):
        """The measurable claim behind the layout: after Z-order clustering,
        parquet row-group min/max extents shrink in BOTH dimensions, so a
        selective filter on either column can skip most groups."""
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        from duckdb_ner_spark.plans.zorder import cluster_by_zorder

        n = 1 << 14
        grid = 1 << 8
        df = (
            spark.range(n)
            .select(
                (F.hash(F.col("id")).bitwiseAND(F.lit(grid - 1))).alias("x"),
                (F.hash(F.col("id") + 999).bitwiseAND(F.lit(grid - 1))).alias("y"),
            )
        )

        def mean_extent(path):
            ext_x, ext_y, groups = 0.0, 0.0, 0
            import os
            for f in os.listdir(path):
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(f"{path}/{f}").metadata
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    cx = {rg.column(i).path_in_schema: rg.column(i).statistics
                          for i in range(rg.num_columns)}
                    ext_x += cx["x"].max - cx["x"].min
                    ext_y += cx["y"].max - cx["y"].min
                    groups += 1
            return ext_x / groups, ext_y / groups

        plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
        df.repartition(16).write.parquet(plain)
        (
            cluster_by_zorder(df, ["x", "y"], bits=8, num_partitions=16)
            .write.parquet(zed)
        )
        px, py = mean_extent(plain)
        zx, zy = mean_extent(zed)
        # unclustered hash data spans ~the full [0,256) range per group;
        # z-clustered groups must be at least 2x tighter in BOTH dims
        assert zx < px / 2 and zy < py / 2, (px, py, zx, zy)


def test_fxsum_big_fixed_point_survives_values_past_long_range(spark):
    """_fxsum_big guard (ADVICE r1, re-pinned for the r13 single-level form):
    totals past 2^63 must accumulate exactly.

    Four rows of 5e18 each overflow a single-level LONG sum — under Spark 4's
    default ANSI mode that THROWS (fail-stop at scale; with ANSI off it would
    wrap silently). The decimal(38,0) accumulator returns the exact 2e19-unit
    total either way: 1e38 headroom means no corpus size can wrap it.
    """
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException
    from pyspark.sql import functions as F

    from duckdb_ner_spark.operators.relational import _fxsum_big

    vals = [5_000_000_000_000_000_000] * 4  # fx units at 1e-6 scale
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)], "k int, sub int, fx long"
    ).repartitionByRange(4, "sub")

    # single-level long sum: overflows (the failure mode being guarded)
    with pytest.raises(ArithmeticException):
        df.groupBy("k").agg(F.sum("fx").alias("s")).collect()

    out = df.groupBy("k").agg(_fxsum_big(F.col("fx"), 6).alias("total")).collect()
    assert out[0]["total"] == sum(vals) / 10**6  # 2e13 money units, exact
