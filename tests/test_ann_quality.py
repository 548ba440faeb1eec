"""ANN quality: recall@k of the approximate variants against the
brute-force ground truth (the contract an ANN index actually makes —
exactness is checked separately by each query's own oracle)."""


from datafusion_parallelism_spark.queries import REGISTRY


def _topk_sets(spark, sf_dir, name):
    out = {}
    for r in REGISTRY[name].fn(spark, sf_dir).collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(truth, approx):
    return sum(len(truth[q] & approx.get(q, set())) / len(truth[q]) for q in truth) / len(truth)


def test_ann_recall_floors(spark, sf_dir_oracle):
    truth = _topk_sets(spark, sf_dir_oracle, "ann_bruteforce_topk")
    lsh = _recall(truth, _topk_sets(spark, sf_dir_oracle, "ann_lsh_topk"))
    ivf = _recall(truth, _topk_sets(spark, sf_dir_oracle, "ann_ivf_topk"))
    # Deterministic data → deterministic recall (measured 0.54 / 0.78);
    # floors catch regressions in bucketing/probing logic.
    assert lsh >= 0.50, f"multi-probe LSH recall@5 regressed: {lsh}"
    assert ivf >= 0.70, f"IVF recall@5 regressed: {ivf}"
