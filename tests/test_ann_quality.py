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
    """Structural + quality invariants of the trained codebook: every code
    array has exactly M entries in [0, K); reconstruction error is
    positive (Lloyd centroids are member MEANS, never an exact member of
    this non-degenerate corpus); and the corpus-mean error beats the
    untrained sampled codebook's measured 0.113 by a wide margin (the
    training actually trained — measured 0.030)."""
    from datafusion_parallelism_spark.queries.llm import _PQ_K, _PQ_M

    rows = REGISTRY["vec_pq_codes"].fn(spark, sf_dir_oracle).collect()
    assert rows
    for r in rows:
        assert len(r.codes) == _PQ_M
        assert all(0 <= c < _PQ_K for c in r.codes)
        assert r.recon_err > 0
    mean_err = sum(r.recon_err for r in rows) / len(rows)
    assert mean_err < 0.05, f"trained codebook regressed: mean err {mean_err}"


def test_pq_adc_recall_floor(spark, sf_dir_oracle):
    """ADC over the 32×64 Lloyd-trained codebook vs exact cosine ground
    truth (unit-normalized, so squared-L2 ADC ranks by the same metric).
    Measured 0.74 on the deterministic fixture (0.66 before training);
    the floor pins it to catch LUT/code-join/training regressions, not to
    certify production recall."""
    truth = _topk_sets(spark, sf_dir_oracle, "ann_bruteforce_topk")
    approx = {}
    for r in REGISTRY["ann_pq_topk"].fn(spark, sf_dir_oracle).collect():
        approx.setdefault(r.qid, set()).add(r.vid)
    rec = _recall(truth, approx)
    assert rec >= _PQ_RECALL_FLOOR, f"PQ-ADC recall@5 regressed: {rec}"


def test_ivfpq_recall_floor(spark, sf_dir_oracle):
    """IVF-PQ compounds cell-pruning miss (IVF alone 0.78) with
    quantization noise (flat PQ alone 0.74): measured 0.60 — below either
    component, exactly as the composition predicts; the floor pins the
    cell-join/ADC plumbing."""
    truth = _topk_sets(spark, sf_dir_oracle, "ann_bruteforce_topk")
    approx = {}
    for r in REGISTRY["ann_ivfpq_topk"].fn(spark, sf_dir_oracle).collect():
        approx.setdefault(r.qid, set()).add(r.vid)
    rec = _recall(truth, approx)
    assert rec >= 0.55, f"IVF-PQ recall@5 regressed: {rec}"


#: measured on the deterministic sf0.01 fixture; update only with evidence.
_PQ_RECALL_FLOOR = 0.70


def _rows_set(df):
    return {
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in df.collect()
    }


def test_pq_arrow_kernel_matches_join_formulation(spark, sf_dir_oracle):
    """Round-11 contract: the Arrow assignment kernel + one-task trainer
    must emit byte-identical results to the broadcast-join + min(struct)
    formulation (spark.graft.pq_arrow=false) for every PQ query."""
    names = ["vec_pq_codes", "ann_pq_topk"]
    fast = {n: _rows_set(REGISTRY[n].fn(spark, sf_dir_oracle)) for n in names}
    prev = spark.conf.get("spark.graft.pq_arrow", None)
    spark.conf.set("spark.graft.pq_arrow", "false")
    try:
        slow = {
            n: _rows_set(REGISTRY[n].fn(spark, sf_dir_oracle)) for n in names
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.graft.pq_arrow")
        else:
            spark.conf.set("spark.graft.pq_arrow", prev)
    for n in names:
        assert fast[n] == slow[n], n


def test_km_arrow_kernel_matches_join_formulation(spark, sf_dir_oracle):
    """Same contract for k-means: Arrow kernel (incl. the exact HALF_UP
    round-before-argmin replica) ≡ join + double-groupBy formulation."""
    name = "vec_kmeans_clusters"
    fast = _rows_set(REGISTRY[name].fn(spark, sf_dir_oracle))
    prev = spark.conf.get("spark.graft.km_arrow", None)
    spark.conf.set("spark.graft.km_arrow", "false")
    try:
        slow = _rows_set(REGISTRY[name].fn(spark, sf_dir_oracle))
    finally:
        if prev is None:
            spark.conf.unset("spark.graft.km_arrow")
        else:
            spark.conf.set("spark.graft.km_arrow", prev)
    assert fast == slow


def test_pq_distributed_training_matches_local(spark, sf_dir_oracle):
    """The one-task trainer (default below the gate) and the distributed
    per-iteration trainer (spark.graft.pq_local_train_max=0) must produce
    the identical codebook, hence identical codes."""
    name = "vec_pq_codes"
    local = _rows_set(REGISTRY[name].fn(spark, sf_dir_oracle))
    prev = spark.conf.get("spark.graft.pq_local_train_max", None)
    spark.conf.set("spark.graft.pq_local_train_max", "0")
    try:
        dist = _rows_set(REGISTRY[name].fn(spark, sf_dir_oracle))
    finally:
        if prev is None:
            spark.conf.unset("spark.graft.pq_local_train_max")
        else:
            spark.conf.set("spark.graft.pq_local_train_max", prev)
    assert local == dist


def test_km_distributed_training_matches_local(spark, sf_dir_oracle):
    name = "vec_kmeans_clusters"
    local = _rows_set(REGISTRY[name].fn(spark, sf_dir_oracle))
    prev = spark.conf.get("spark.graft.km_local_train_max", None)
    spark.conf.set("spark.graft.km_local_train_max", "0")
    try:
        dist = _rows_set(REGISTRY[name].fn(spark, sf_dir_oracle))
    finally:
        if prev is None:
            spark.conf.unset("spark.graft.km_local_train_max")
        else:
            spark.conf.set("spark.graft.km_local_train_max", prev)
    assert local == dist
