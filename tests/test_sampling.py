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


def test_stratified_sample_verdict_matches_oracle(spark, sf_dir_oracle):
    """The registered result is the per-source binomial-tolerance verdict
    (promoted from rows-only in r4): lo/hi computed by the identical IEEE
    expression tree on both sides, in_band asserted TRUE by the oracle."""
    spec = REGISTRY["mix_stratified_sample"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail


def test_stratified_sample_all_sources_in_band(spark, sf_dir_oracle):
    rows = REGISTRY["mix_stratified_sample"].fn(spark, sf_dir_oracle).collect()
    assert {r.source for r in rows} >= set(MIX_WEIGHTS)
    for r in rows:
        assert r.in_band, (r.source, r.sampled_lo, r.sampled_hi)
        assert r.sampled_lo <= r.sampled_hi


def test_stratified_sample_deterministic(spark, sf_dir_oracle):
    fn = REGISTRY["mix_stratified_sample"].fn
    key = lambda r: (r.source, r.n_source, r.sampled_lo, r.sampled_hi, r.in_band)
    a = sorted(map(key, fn(spark, sf_dir_oracle).collect()))
    b = sorted(map(key, fn(spark, sf_dir_oracle).collect()))
    assert a == b
