"""Property-based differential test: asof_join vs pandas merge_asof.

pandas ``merge_asof`` is the de-facto reference semantics for point-in-time
joins (backward/forward, inclusive ties, tolerance).  Hypothesis generates
small random keyed time series and the union+window implementation
(operators/asof.py) must agree row-for-row with pandas on every draw —
covering the edge lattice (empty sides, keys missing on either side, tied
timestamps, matches exactly AT the tolerance bound) far denser than
hand-written cases.

Right rows are deduplicated to one per (key, ts): with duplicates, both
engines tie-break by input order, which Spark does not define — that case
is exercised deterministically in test_asof_join.py instead.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_parallelism_spark.operators.asof import asof_join

_BASE = pd.Timestamp("2024-01-01")


def _ts(sec: int) -> pd.Timestamp:
    return _BASE + pd.Timedelta(seconds=sec)


rows_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=8
)
rows_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=8
)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@given(lrows=rows_left, rrows=rows_right, tol=st.sampled_from([None, 0, 5, 20]))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_pandas_merge_asof(spark, direction, lrows, rrows, tol):
    rrows = list({(k, s) for k, s in rrows})  # unique (key, ts) on the right
    lpdf = pd.DataFrame(
        {
            "k": [k for k, _ in lrows],
            "ts": [_ts(s) for _, s in lrows],
            "lv": range(len(lrows)),
        }
    ).sort_values(["ts", "k", "lv"], kind="stable")
    rpdf = pd.DataFrame(
        {
            "k": pd.Series([k for k, _ in rrows], dtype="int64"),
            "ts": pd.Series([_ts(s) for _, s in rrows], dtype="datetime64[ns]"),
            "rv": pd.Series(range(len(rrows)), dtype="int64"),
        }
    ).sort_values(["ts", "k"], kind="stable")

    expected = pd.merge_asof(
        lpdf,
        rpdf,
        on="ts",
        by="k",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
    )
    exp = {
        int(r.lv): (None if pd.isna(r.rv) else int(r.rv))
        for r in expected.itertuples()
    }

    left = spark.createDataFrame(lpdf, schema="k long, ts timestamp, lv long")
    right = (
        spark.createDataFrame(rpdf, schema="k long, ts timestamp, rv long")
        if len(rpdf)
        else spark.createDataFrame([], schema="k long, ts timestamp, rv long")
    )
    out = asof_join(
        left,
        right,
        on="k",
        left_ts="ts",
        right_ts="ts",
        direction=direction,
        tolerance=f"{tol} SECONDS" if tol is not None else None,
    )
    got = {int(r.lv): (None if r.rv is None else int(r.rv)) for r in out.collect()}
    assert got == exp
