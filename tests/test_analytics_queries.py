"""Analytics corpus (windows / rollup / set ops / events) vs DuckDB oracle."""

import pytest

from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.testing import compare_to_oracle

NAMES = sorted(
    n
    for n in REGISTRY
    if n.startswith(
        ("window_", "rollup_", "cube_", "grouping_", "setop_", "events_", "agg_", "scalar_", "merge_", "mix_")
    )
    and REGISTRY[n].oracle is not None  # sketch aggregates: tests/test_sketches.py
)


@pytest.mark.parametrize("name", NAMES)
def test_analytics_query_matches_oracle(spark, sf_dir_oracle, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir_oracle)
    assert spec.oracle is not None
    ok, detail = compare_to_oracle(spark, df, spec.oracle, sf_dir_oracle)
    assert ok, f"{name}: {detail}"
