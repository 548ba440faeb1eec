"""Sketch aggregates: approximation error pinned against exact answers
(the correctness contract approximate operators can actually make)."""

import duckdb

from datafusion_parallelism_spark.queries import REGISTRY


def test_approx_distinct_within_rsd(spark, sf_dir_oracle):
    # The query output carries the property verdict; exact side vs DuckDB.
    rows = REGISTRY["agg_approx_distinct_users"].fn(spark, sf_dir_oracle).collect()
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) FROM "
            f"'{sf_dir_oracle}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.exact_users == exact[r.event_type]
        assert r.hll_within_bound, (r.event_type, r.exact_users)

    # Pin the raw estimate magnitude too (the query only exposes the
    # boolean; this keeps an absolute-error regression visible).
    from datafusion_parallelism_spark.session import load
    from pyspark.sql import functions as F

    approx = {
        r.event_type: r.a
        for r in load(spark, sf_dir_oracle, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("a"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.05 * n), (et, approx[et], n)


def test_quantiles_within_tolerance(spark, sf_dir_oracle):
    # Property verdicts from the query itself...
    rows = REGISTRY["agg_value_quantiles"].fn(spark, sf_dir_oracle).collect()
    assert rows
    for r in rows:
        assert r.p50_ok and r.p90_ok and r.p99_ok, r

    # ...plus an independent magnitude check of the raw sketch values.
    from datafusion_parallelism_spark.session import load
    from pyspark.sql import functions as F

    got = {
        r.event_type: r.q
        for r in load(spark, sf_dir_oracle, "events")
        .groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("q"))
        .collect()
    }
    con = duckdb.connect()
    exact = {
        et: (q50, q90, q99)
        for et, q50, q90, q99 in con.execute(
            f"SELECT event_type, quantile_cont(value, 0.5), quantile_cont(value, 0.9), "
            f"quantile_cont(value, 0.99) FROM '{sf_dir_oracle}/events.parquet' GROUP BY 1"
        ).fetchall()
    }
    assert set(got) == set(exact)
    for et in got:
        lo, hi = exact[et][0], exact[et][2]
        spread = max(hi - lo, 1.0)
        for got_q, exact_q in zip(got[et], exact[et]):
            assert abs(got_q - exact_q) <= 0.1 * spread + 1.0, (et, got[et], exact[et])
