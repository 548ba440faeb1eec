"""Stratified sampling / data mixing: exact proportions query vs oracle,
and the seeded sample's realized mix within binomial tolerance."""

from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.queries.llm import MIX_WEIGHTS
from datafusion_parallelism_spark.testing import compare_to_oracle


def test_mix_proportions_matches_oracle(spark, sf_dir_oracle):
    spec = REGISTRY["mix_source_proportions"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail


def test_stratified_sample_hits_recipe(spark, sf_dir_oracle):
    rows = REGISTRY["mix_stratified_sample"].fn(spark, sf_dir_oracle).collect()
    assert rows
    by_source = {}
    for r in rows:
        by_source[r.source] = by_source.get(r.source, 0) + 1
    # only recipe sources present
    assert set(by_source) <= set(MIX_WEIGHTS)
    total = len(rows)
    for s, w in MIX_WEIGHTS.items():
        frac = by_source.get(s, 0) / total
        # Bernoulli sampling at n≈50 (seeded, deterministic draw) →
        # generous tolerance; still catches a recipe/implementation
        # mix-up (weights differ by ≥0.05).
        assert abs(frac - w) < 0.15, (s, frac, w)


def test_stratified_sample_deterministic(spark, sf_dir_oracle):
    fn = REGISTRY["mix_stratified_sample"].fn
    a = sorted(r.doc_id for r in fn(spark, sf_dir_oracle).collect())
    b = sorted(r.doc_id for r in fn(spark, sf_dir_oracle).collect())
    assert a == b
