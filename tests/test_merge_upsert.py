"""merge_upsert semantics: update, insert, no-op, NULL-setting update,
delete — plus the registered CDC query vs its oracle."""

from datafusion_parallelism_spark.operators.merge import merge_upsert
from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.testing import compare_to_oracle
from pyspark.sql import functions as F


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        schema="k long, name string, val double",
    )
    source = spark.createDataFrame(
        [(2, "b2", None), (4, "d", 40.0), (3, "DEL", -1.0)],
        schema="k long, name string, val double",
    )
    return target, source


def test_update_insert_noop_and_null_update(spark):
    target, source = _frames(spark)
    out = {r.k: (r.name, r.val) for r in merge_upsert(target, source, on="k").collect()}
    assert out == {
        1: ("a", 10.0),   # no-op
        2: ("b2", None),  # update may set NULL (presence flag, not coalesce)
        3: ("DEL", -1.0),  # plain update (no delete predicate)
        4: ("d", 40.0),   # insert
    }


def test_delete_predicate_removes_keys(spark):
    target, source = _frames(spark)
    out = {
        r.k: r.name
        for r in merge_upsert(
            target, source, on="k", delete=F.col("name") == "DEL"
        ).collect()
    }
    assert out == {1: "a", 2: "b2", 4: "d"}


def test_schema_mismatch_rejected(spark):
    target, source = _frames(spark)
    try:
        merge_upsert(target, source.select("k", "name"), on="k")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_merge_cdc_query_matches_oracle(spark, sf_dir_oracle):
    spec = REGISTRY["merge_orders_cdc"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail
