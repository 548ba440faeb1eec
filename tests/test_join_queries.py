"""Join-semantics corpus vs the DuckDB oracle (reference test matrix,
src/lib.rs:36-726, re-expressed — see queries/joins.py)."""

import pytest

from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.testing import compare_to_oracle

JOIN_QUERIES = sorted(n for n in REGISTRY if n.startswith("join_"))


@pytest.mark.parametrize("name", JOIN_QUERIES)
def test_join_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert spec.oracle is not None
    ok, detail = compare_to_oracle(spark, df, spec.oracle, sf_dir)
    assert ok, f"{name}: {detail}"
