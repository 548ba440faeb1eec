"""Interval (range) join — bucketized, exact, no cross-join.

``left.ts BETWEEN right.start AND right.end`` with an equi key.  Spark
plans a naive BETWEEN join as equi-join-plus-filter only when the key is
selective; keyless or hot-key interval joins degenerate to per-key cross
products.  The bucketized formulation keeps it exact AND bounded:

1. intervals explode into the coarse time buckets they cover
   (``sequence(bucket(start), bucket(end))``);
2. probe rows compute their single bucket;
3. equi-join on (key, bucket), then the exact BETWEEN predicate refines.

Each (row, interval) candidate pair is generated exactly once — a row has
ONE bucket and an interval covers it at most once — so results equal the
exact interval join with no dedup step.  Cost is |left| + Σ interval
spans/bucket, shuffled on (key, bucket): the skew of long intervals is
spread across their buckets, which is the point at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_SECONDS = 3600  # 1-hour buckets; tune to typical interval length


def _bucket(ts: Column, seconds: int) -> Column:
    return (F.unix_timestamp(ts) / seconds).cast("long")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = BUCKET_SECONDS,
    how: str = "inner",
) -> DataFrame:
    """Exact interval join: left rows matched to every right interval of
    the same ``key`` with ``left_ts`` in [right_start, right_end].

    Output: left columns + right's non-key columns.  ``how='inner'`` only
    (unmatched semantics of interval joins are workload-specific)."""
    if how != "inner":
        raise ValueError("interval_join supports how='inner'")
    r_exploded = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                _bucket(F.col(right_start), bucket_seconds),
                _bucket(F.col(right_end), bucket_seconds),
            )
        ),
    )
    l_bucketed = left.withColumn("__b", _bucket(F.col(left_ts), bucket_seconds))
    rkeys = {key, "__b"}
    joined = l_bucketed.alias("l").join(
        r_exploded.alias("r"),
        (F.col(f"l.{key}") == F.col(f"r.{key}")) & (F.col("l.__b") == F.col("r.__b")),
    )
    refined = joined.filter(
        (F.col(f"l.{left_ts}") >= F.col(f"r.{right_start}"))
        & (F.col(f"l.{left_ts}") <= F.col(f"r.{right_end}"))
    )
    return refined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right.columns if c not in rkeys and c != "__b"],
    )
