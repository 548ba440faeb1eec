"""Sketch aggregates: approximation error pinned against exact answers
(the correctness contract approximate operators can actually make)."""

import duckdb

from datafusion_parallelism_spark.queries import REGISTRY


def test_approx_distinct_within_rsd(spark, sf_dir_oracle):
    got = {
        r.event_type: r.approx_users
        for r in REGISTRY["agg_approx_distinct_users"].fn(spark, sf_dir_oracle).collect()
    }
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) FROM "
            f"'{sf_dir_oracle}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for et, n in exact.items():
        assert abs(got[et] - n) <= max(2, 0.05 * n), (et, got[et], n)


def test_quantiles_within_tolerance(spark, sf_dir_oracle):
    rows = REGISTRY["agg_value_quantiles"].fn(spark, sf_dir_oracle).collect()
    con = duckdb.connect()
    exact = {
        et: (q50, q90, q99)
        for et, q50, q90, q99 in con.execute(
            f"SELECT event_type, quantile_cont(value, 0.5), quantile_cont(value, 0.9), "
            f"quantile_cont(value, 0.99) FROM '{sf_dir_oracle}/events.parquet' GROUP BY 1"
        ).fetchall()
    }
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        lo, hi = exact[r.event_type][0], exact[r.event_type][2]
        spread = max(hi - lo, 1.0)
        for got_q, exact_q in zip(r.quantiles, exact[r.event_type]):
            assert abs(got_q - exact_q) <= 0.1 * spread + 1.0, (
                r.event_type,
                r.quantiles,
                exact[r.event_type],
            )
