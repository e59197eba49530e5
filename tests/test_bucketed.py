"""Bucketed-table write/read: the pay-shuffle-once-at-write scale path.

The load-bearing assertion is on the PLAN: a join of two tables
bucketed by the same key into the same bucket count must contain no
Exchange operator — the scan satisfies the join's distribution
requirement. A raw parquet read of identical data must show Exchanges.
"""

import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.sources.bucketed import read_bucketed, write_bucketed
from polars_dataset_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "t_li_bucketed", "l_orderkey", num_buckets=8)
    write_bucketed(od, "t_od_bucketed", "l_orderkey", num_buckets=8)
    yield "t_li_bucketed", "t_od_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_od_bucketed")


def _executed_plan(df):
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t_li, t_od = bucketed_pair
    # disable broadcast to simulate the regime bucketing targets (both
    # sides too large to broadcast) — otherwise the tiny test table is
    # broadcast and the bucket metadata never comes into play
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, t_li).join(
            read_bucketed(spark, t_od), "l_orderkey"
        )
        assert "Exchange" not in _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    # control: same join without bucketing must contain an Exchange
    # (broadcast or shuffle) — proves the bucketed assert is not vacuous
    assert "Exchange" in _executed_plan(li.join(od, "l_orderkey"))


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    t_li, _ = bucketed_pair
    agg = (
        read_bucketed(spark, t_li)
        .groupBy("l_orderkey")
        .agg(F.sum("l_extendedprice").alias("s"))
    )
    assert "Exchange" not in _executed_plan(agg)


def test_bucketed_join_values_match_plain_join(spark, sf_dir, bucketed_pair):
    t_li, t_od = bucketed_pair
    bucketed = (
        read_bucketed(spark, t_li)
        .join(read_bucketed(spark, t_od), "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    od = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    plain = (
        li.join(od, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_partitioned_write_prunes_at_planning_time(spark, sf_dir, tmp_path):
    from polars_dataset_spark.sources import read_partitioned, write_partitioned

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "li_part")
    write_partitioned(li, path, "l_returnflag")
    back = read_partitioned(spark, path)
    # correctness: layout round-trips
    assert back.count() == li.count()
    flt = back.filter(F.col("l_returnflag") == "R")
    assert flt.count() == li.filter(F.col("l_returnflag") == "R").count()
    # the 100-TB contract: the filter is a PARTITION filter — directory
    # pruning at planning time, not a row-level predicate after the scan
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "l_returnflag" in pf
