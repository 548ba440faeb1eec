"""Observation API: per-query metrics collected DURING execution (no second
pass over the data) — the engine-side instrumentation a production pipeline
uses for row-count/invariant monitoring at 100 TB."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from datafusion_parallelism_spark.session import force_execute, load


def test_observe_collects_metrics_in_one_pass(spark, sf_dir):
    obs = Observation("ingest_stats")
    e = load(spark, sf_dir, "events").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("null_values"),
    )
    out = e.filter(F.col("event_type") == "click")
    force_execute(out)
    got = obs.get
    assert got["n_rows"] == load(spark, sf_dir, "events").count()
    assert got["null_values"] == 0
