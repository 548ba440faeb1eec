"""Registered streaming corpus entries vs DuckDB oracle."""

import pytest

from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.testing import compare_to_oracle

ORACLE_NAMES = sorted(
    n for n in REGISTRY if n.startswith("stream_") and REGISTRY[n].oracle
)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_stream_query_matches_oracle(spark, sf_dir_oracle, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir_oracle)
    ok, detail = compare_to_oracle(spark, df, spec.oracle, sf_dir_oracle)
    assert ok, f"{name}: {detail}"


def test_stream_session_windows_runs(spark, sf_dir_oracle):
    df = REGISTRY["stream_session_windows"].fn(spark, sf_dir_oracle)
    assert df.count() > 0
