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


def test_pq_codes_properties(spark, sf_dir_oracle):
    """Codebook anchors must encode to themselves with zero reconstruction
    error — the PQ identity that catches any slicing/argmin off-by-one."""
    from datafusion_parallelism_spark.queries.llm import _PQ_K, _PQ_M

    codes = {
        r.vec_id: r
        for r in REGISTRY["vec_pq_codes"].fn(spark, sf_dir_oracle).collect()
    }
    for aid in range(_PQ_K):
        r = codes[aid]
        assert list(r.codes) == [aid] * _PQ_M
        assert r.recon_err == 0.0
    # non-anchor vectors have strictly positive quantization error
    assert all(r.recon_err > 0 for v, r in codes.items() if v >= _PQ_K)


def test_pq_adc_recall_floor(spark, sf_dir_oracle):
    """ADC over the 32×64 sampled codebook vs exact cosine ground truth
    (unit-normalized, so squared-L2 ADC ranks by the same metric).
    Measured 0.66 on the deterministic fixture; the floor pins it to
    catch LUT/code-join regressions, not to certify production recall."""
    truth = _topk_sets(spark, sf_dir_oracle, "ann_bruteforce_topk")
    approx = {}
    for r in REGISTRY["ann_pq_topk"].fn(spark, sf_dir_oracle).collect():
        approx.setdefault(r.qid, set()).add(r.vid)
    rec = _recall(truth, approx)
    assert rec >= _PQ_RECALL_FLOOR, f"PQ-ADC recall@5 regressed: {rec}"


#: measured on the deterministic sf0.01 fixture; update only with evidence.
_PQ_RECALL_FLOOR = 0.60
