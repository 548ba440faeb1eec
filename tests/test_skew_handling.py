"""Skew mitigation — the Spark answer to the reference's work-stealing
repartitioner (SURVEY A22, work_stealing_repartition_exec.rs:50-91).

The reference fixes probe-side skew by letting idle partitions steal
batches from peers' queues.  Spark's equivalent is AQE's skew-join split:
at runtime, a shuffle partition larger than the skew threshold is split
into multiple tasks (and dynamic task scheduling spreads them over cores).
This test constructs a heavily skewed join (one key owns ~95% of rows) and
asserts the executed plan actually split the skewed partition
(``skew=true`` on the join node).
"""

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # Tiny thresholds so the synthetic skew triggers the splitter.
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
        # ... and keep AQE from converting it to broadcast at runtime (the
        # session default allows that — it would legitimately erase the skew).
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", "8")

        # 95% of fact rows share key 0; dimension is uniform.
        fact = spark.range(0, 100_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id") % 97).alias("k"),
            F.lpad(F.col("id").cast("string"), 64, "x").alias("pad"),
        )
        dim = spark.range(0, 97).select(
            F.col("id").alias("k"), F.col("id").alias("dim_v")
        )
        joined = fact.join(dim, "k")
        # Execute joined's OWN plan (count() would build a different tree
        # and leave this one un-finalized under AQE).
        assert len(joined.collect()) == 100_000

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)
