"""Differential tests for hand-rewritten aggregate plans.

The rewrites exist for performance (de-Expand of multi-COUNT(DISTINCT),
queries/analytics.py); these tests pin that they stay value-identical to
the straightforward GROUP BY on inputs the driver data never exercises —
NULL group keys, NULL counted values, empty groups.
"""

import pytest
from pyspark.sql import functions as F

from datafusion_parallelism_spark.queries.analytics import _multi_distinct_counts


def _reference(l):
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n"),
    )


def _as_tuples(df):
    return [
        (r.l_returnflag, r.n_supp, r.n_part, r.n)
        for r in df.select("l_returnflag", "n_supp", "n_part", "n").collect()
    ]


@pytest.mark.parametrize(
    "rows",
    [
        # NULL group key forms its own group (ADVICE r6: plain equi-joins
        # would drop it; eqNullSafe keeps it).
        [
            ("A", 1, 10),
            ("A", 1, 20),
            (None, 2, 10),
            (None, 3, 10),
            (None, 3, None),
        ],
        # NULL counted values: COUNT(DISTINCT x) ignores NULLs but
        # COUNT(*) does not — an all-NULL group must report 0 distincts
        # with a nonzero row count.
        [("B", None, None), ("B", None, 5), ("C", 7, None)],
        # Single group, duplicates only.
        [("R", 4, 4), ("R", 4, 4), ("R", 4, 4)],
    ],
)
def test_multi_distinct_rewrite_matches_group_by(spark, rows):
    l = spark.createDataFrame(
        rows, "l_returnflag string, l_suppkey long, l_partkey long"
    )
    got = _as_tuples(_multi_distinct_counts(l))
    want = _as_tuples(_reference(l))
    # None group keys aren't orderable against str; normalize for sorting.
    key = lambda t: (t[0] is None, t[0] or "", t[1:])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
