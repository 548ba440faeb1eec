#!/usr/bin/env python
"""Reference-parity micro-benchmarks (not part of the driver BENCH contract).

Replicates the reference's criterion benchmark *shapes* with synthetic data
so its research subject — parallel join build/probe throughput — has a
directly comparable Spark number on this machine:

* LinearDist/Size256 (benches/my_benchmark.rs:160-215): 10.24M-row base
  table (ids in 256-row blocks) joined to four 262,144-row dimension
  tables, 8-way parallelism in the reference; here local[N] tasks.
* exponential_distribution (benches/exponential_distribution.rs:29-60):
  skewed (exponential) key distribution joined to a uniform dimension —
  the shape the work-stealing repartitioner targets; here AQE skew-split.

The reference archived NO successful numbers (BASELINE.md); these wall
clocks are the measured stand-in.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_parallelism_spark.session import get_spark  # noqa: E402

BASE_ROWS = 10_240_000  # 10,000 batches x 1,024 rows (my_benchmark.rs:30-37)
DIM_ROWS = 262_144
N_DIMS = 4


def linear_dist(spark) -> float:
    """4 chained inner joins, ids uniform over the dim domain."""
    base = spark.range(BASE_ROWS).select(
        *[
            (F.floor(F.col("id") / 256) % DIM_ROWS).alias(f"id{i}")
            for i in range(1, N_DIMS + 1)
        ],
        F.lit("hello").alias("value"),
    )
    j = base
    for i in range(1, N_DIMS + 1):
        dim = spark.range(DIM_ROWS).select(
            F.col("id").alias(f"d{i}_id"), F.lit("world").alias(f"d{i}_value")
        )
        j = j.join(dim, j[f"id{i}"] == dim[f"d{i}_id"])
    t0 = time.perf_counter()
    j.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def exponential_dist(spark) -> float:
    """Skewed probe keys (geometric/exponential over the key domain) vs a
    uniform build side (api_utils.rs:15-23 key gen)."""
    base = spark.range(BASE_ROWS).select(
        F.least(
            (-F.log(F.rand(seed=42)) * 40_000).cast("long"), F.lit(DIM_ROWS - 1)
        ).alias("k"),
        F.lit("hello").alias("value"),
    )
    dim = spark.range(DIM_ROWS).select(F.col("id").alias("k2"), F.lit("w").alias("dv"))
    j = base.join(dim, base["k"] == dim["k2"])
    t0 = time.perf_counter()
    j.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="bench-reference-shape")
    spark.sparkContext.setLogLevel("ERROR")
    # Dims are ~2 MB each — realistic plans broadcast them, which is also
    # what the reference's broadcast-threshold design anticipates
    # (my_benchmark.rs:159 sizes tables *above* the broadcast limit to
    # force partitioned joins; measure both modes).
    times = {}
    times["linear_dist_broadcast"] = linear_dist(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # The session default lets AQE convert back to broadcast from RUNTIME
    # sizes — pin it too, or the 'partitioned' row measures broadcast.
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    times["linear_dist_partitioned"] = linear_dist(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "64MB")
    times["exponential_dist_skew"] = exponential_dist(spark)
    print(
        json.dumps(
            {
                "metric": "reference_bench_shapes",
                "unit": "sec",
                "base_rows": BASE_ROWS,
                "dim_rows": DIM_ROWS,
                "times": times,
            }
        )
    )


if __name__ == "__main__":
    main()
