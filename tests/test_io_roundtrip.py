"""CSV/JSON source round-trip queries vs DuckDB oracle on the original
parquet — a hash match proves the write→read cycle is lossless."""

import pytest

from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.testing import compare_to_oracle

NAMES = sorted(n for n in REGISTRY if n.startswith("source_"))


@pytest.mark.parametrize("name", NAMES)
def test_roundtrip_matches_oracle(spark, sf_dir_oracle, name):
    spec = REGISTRY[name]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, f"{name}: {detail}"


def test_csv_write_is_distributed(spark, sf_dir_oracle):
    """The sink must emit one file per partition (the 100 TB shape), not a
    driver-side single file."""
    import glob
    import os

    from datafusion_parallelism_spark.queries.io_roundtrip import _stage

    REGISTRY["source_csv_roundtrip"].fn(spark, sf_dir_oracle).collect()
    parts = glob.glob(os.path.join(_stage("csv", sf_dir_oracle), "part-*"))
    assert len(parts) >= 1


def test_partitioned_read_prunes_partitions(spark, sf_dir_oracle):
    """The event_type filter must land in PartitionFilters (directory-level
    pruning), not as a data filter after a full scan."""
    from datafusion_parallelism_spark.queries.io_roundtrip import _stage

    df = REGISTRY["source_partitioned_prune"].fn(spark, sf_dir_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.split("\n") if "FileScan parquet" in l]
    assert scan and "PartitionFilters: [" in scan[0]
    assert "event_type" in scan[0].split("PartitionFilters:")[1].split("]")[0]


def test_bucketed_join_query_has_no_exchange(spark, sf_dir_oracle):
    """The registered bucketed-join query must plan with zero shuffles."""
    df = REGISTRY["source_bucketed_join"].fn(spark, sf_dir_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # A shuffle-based join (not broadcast — broadcast bypasses the bucket
    # layout entirely) with NO exchange on EITHER join key: the bucketed
    # files alone satisfy the join's distribution requirement.
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan
