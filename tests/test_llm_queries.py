"""LLM-pipeline corpus (dedup / ANN / text analysis) vs DuckDB oracle."""

import pytest

from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.testing import compare_to_oracle

NAMES = sorted(
    n for n in REGISTRY if n.startswith(("text_", "dedup_", "ann_", "corpus_", "vec_"))
)


def test_llm_corpus_registered():
    assert len(NAMES) >= 10


@pytest.mark.parametrize("name", NAMES)
def test_llm_query_matches_oracle(spark, sf_dir_oracle, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir_oracle)
    assert spec.oracle is not None
    ok, detail = compare_to_oracle(spark, df, spec.oracle, sf_dir_oracle)
    assert ok, f"{name}: {detail}"
