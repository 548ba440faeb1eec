"""asof_join operator semantics (ties, no-match, inner mode, null right
columns) + oracle equivalence of the registered events query."""

from datetime import datetime

from datafusion_parallelism_spark.operators.asof import asof_join
from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.testing import compare_to_oracle


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),
            (1, _ts("2024-01-01T12:00:00"), "p2"),
            (2, _ts("2024-01-01T09:00:00"), "p3"),  # before any right row
            (3, _ts("2024-01-01T10:00:00"), "p4"),  # key absent on right
        ],
        schema="k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), "r1", None),
            (1, _ts("2024-01-01T12:00:00"), "r2", 20.0),  # tie with p2 → matches
            (2, _ts("2024-01-01T11:00:00"), "r3", 30.0),
        ],
        schema="k long, ts timestamp, rv string, rx double",
    )
    return left, right


def test_asof_left_semantics(spark):
    left, right = _frames(spark)
    out = {
        r.lv: (r.rv, r.rx)
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()
    }
    assert out == {
        "p1": ("r1", None),  # latest right ≤ 10:00 — struct keeps null rx atomic
        "p2": ("r2", 20.0),  # tie at 12:00 matches
        "p3": (None, None),  # right rows exist but all later
        "p4": (None, None),  # key never on right
    }


def test_asof_inner_drops_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", how="inner")
    assert sorted(r.lv for r in out.collect()) == ["p1", "p2"]


def test_asof_no_pairwise_expansion(spark):
    """The plan must contain no nested-loop/cartesian node — the union+window
    formulation is a single hash-partitioned sort, not a range join."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_events_asof_matches_duckdb_native_asof(spark, sf_dir_oracle):
    spec = REGISTRY["events_asof_last_click"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail


def test_asof_forward_semantics(spark):
    """Forward direction: earliest right row with right_ts >= left_ts;
    ties match; rows past the last right row get NULLs."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", direction="forward"
    )
    got = {r.lv: r.rv for r in out.collect()}
    assert got == {
        "p1": "r2",  # 10:00 → earliest right >= is 12:00 (r1 at 09:30 is past)
        "p2": "r2",  # tie at 12:00 matches
        "p3": "r3",  # 09:00 → 11:00
        "p4": None,  # key absent on right
    }


def test_events_asof_forward_matches_duckdb_native_asof(spark, sf_dir_oracle):
    spec = REGISTRY["events_asof_next_click"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail


def test_asof_tolerance_nulls_stale_matches(spark):
    """Backward + tolerance: a match older than left_ts - tolerance is
    discarded (pandas merge_asof(tolerance=...) semantics); in-window and
    tied matches survive; 'inner' drops the nulled rows."""
    left, right = _frames(spark)
    out = {
        r.lv: r.rv
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", tolerance="30 MINUTES"
        ).collect()
    }
    assert out == {
        "p1": "r1",   # 09:30 is exactly 30 min before 10:00 → inside bound
        "p2": "r2",   # tie at 12:00, zero age
        "p3": None,   # no right row at or before 09:00
        "p4": None,   # key absent
    }
    tight = {
        r.lv: r.rv
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", tolerance="10 MINUTES"
        ).collect()
    }
    assert tight["p1"] is None  # r1 is 30 min old → outside the 10-min bound
    inner = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        tolerance="10 MINUTES", how="inner",
    )
    assert {r.lv for r in inner.collect()} == {"p2"}
