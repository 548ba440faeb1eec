"""connected_components unit tests (chain, cycle, disjoint components)."""


from datafusion_parallelism_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, schema="u long, v long")
    out = connected_components(df)
    return {r.node: r.cluster for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter > 1 forces multiple propagation rounds.
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_cycle_and_disjoint_components(spark):
    got = _cc(spark, [(10, 11), (11, 12), (12, 10), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_edge_orientation_irrelevant(spark):
    assert _cc(spark, [(2, 1), (3, 2)]) == _cc(spark, [(1, 2), (2, 3)])


def test_path_1000_converges_log_diameter(spark):
    # Adversarial chain-shaped dup graph: plain min-label propagation needs
    # diameter (=999) iterations; pointer jumping must converge in <= 10.
    # (Measured: 5.)  This is the 100 TB posture — transitive dup chains
    # A~B~C~... can legitimately have huge diameter.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], schema="u long, v long"
    )
    stats = {}
    labels = connected_components(edges, max_iter=10, stats=stats)
    rows = labels.collect()
    assert len(rows) == 1000
    assert all(r.cluster == 0 for r in rows)
    assert stats["iterations"] <= 10


def test_stats_iterations_reported(spark):
    stats = {}
    df = spark.createDataFrame([(1, 2), (2, 3)], schema="u long, v long")
    connected_components(df, stats=stats).collect()
    assert stats["iterations"] >= 1
