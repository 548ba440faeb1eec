"""Data-layout capabilities for scale: hive-partitioned writes with
partition pruning, and bucketed tables giving shuffle-free co-located
joins — the physical-layout levers a 100 TB deployment depends on."""

import pytest
from pyspark.sql import functions as F

from datafusion_parallelism_spark.plans import (
    explain_str,
    forced_join_strategy,
    physical_plan_str,
)
from datafusion_parallelism_spark.session import load


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    load(spark, sf_dir, "events").write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(out)

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = explain_str(df)
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan

    total = spark.read.parquet(out).count()
    clicks = df.count()
    assert 0 < clicks < total


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Tables bucketed on the join key join WITHOUT any shuffle — the
    co-located-join layout (reference analog: pre-partitioned build/probe
    sides, PartitionMode::Partitioned)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    orders.write.bucketBy(8, "o_custkey").mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").mode("overwrite").saveAsTable("b_customer")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        with forced_join_strategy(spark, "sort_merge"):
            plan = physical_plan_str(j)
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            rows = j.count()
        assert rows > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
