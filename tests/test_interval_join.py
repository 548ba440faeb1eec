"""interval_join: exactness vs a naive BETWEEN join (including intervals
spanning many buckets and overlapping intervals), plus the registered
query vs its oracle."""

from datetime import datetime

from pyspark.sql import functions as F

from datafusion_parallelism_spark.operators.ranges import interval_join
from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.testing import compare_to_oracle


def _ts(s):
    return datetime.fromisoformat(s)


def test_matches_naive_between_join(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:30:00"), "e1"),
            (1, _ts("2024-01-01T05:59:59"), "e2"),
            (1, _ts("2024-01-01T06:00:01"), "e3"),
            (2, _ts("2024-01-01T00:30:00"), "e4"),
        ],
        schema="k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T06:00:00"), "long6h"),
            (1, _ts("2024-01-01T00:15:00"), _ts("2024-01-01T00:45:00"), "short"),
            (2, _ts("2024-01-02T00:00:00"), _ts("2024-01-02T01:00:00"), "nomatch"),
        ],
        schema="k long, s timestamp, e timestamp, iname string",
    )
    got = sorted(
        (r.tag, r.iname)
        for r in interval_join(
            left, right, key="k", left_ts="ts", right_start="s", right_end="e"
        ).collect()
    )
    naive = sorted(
        (r.tag, r.iname)
        for r in left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("l.ts") >= F.col("r.s"))
            & (F.col("l.ts") <= F.col("r.e")),
        )
        .collect()
    )
    # overlapping intervals → e1 matches BOTH long6h and short, exactly once
    # each; e3 is past the interval end; e4's key-2 interval is a day away.
    assert got == naive == [("e1", "long6h"), ("e1", "short"), ("e2", "long6h")]


def test_interval_query_matches_oracle(spark, sf_dir_oracle):
    spec = REGISTRY["events_interval_first6h"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail
