"""Graph-operator unit tests: connected_components and pagerank."""

import numpy as np

from datafusion_parallelism_spark.operators.graph import (
    connected_components,
    pagerank,
)


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


def _pr_reference(edges, damping, iterations):
    """NumPy power iteration — independent oracle for the Spark operator."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        dm = r[outdeg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dm / n)
    return {nodes[i]: r[i] for i in range(n)}


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, schema="u long, v long")
    return {r.node: r["rank"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_numpy_reference(spark):
    # Asymmetric directed graph with a hub (3) and a cycle back edge.
    edges = [(1, 3), (2, 3), (4, 3), (3, 1), (1, 2), (5, 1)]
    got = _pr(spark, edges, damping=0.85, iterations=10)
    want = _pr_reference(edges, 0.85, 10)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_pagerank_dangling_mass_redistributed(spark):
    # 1 -> 2 -> 3 with 3 dangling: ranks must still sum to 1 and increase
    # monotonically downstream (3 accumulates 2's mass which holds 1's).
    got = _pr(spark, [(1, 2), (2, 3)], damping=0.85, iterations=15)
    assert abs(sum(got.values()) - 1.0) < 1e-12
    assert got[1] < got[2] < got[3]
    want = _pr_reference([(1, 2), (2, 3)], 0.85, 15)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_pagerank_symmetric_graph_uniform(spark):
    # Bidirectional 3-cycle: perfect symmetry => exactly uniform ranks at
    # every iteration, regardless of damping.
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)]
    got = _pr(spark, edges, damping=0.85, iterations=5)
    for v in got.values():
        assert abs(v - 1.0 / 3.0) < 1e-12


def test_graph_queries_match_oracle(spark, sf_dir_oracle):
    from datafusion_parallelism_spark.queries import REGISTRY
    from datafusion_parallelism_spark.testing import compare_to_oracle

    names = sorted(n for n in REGISTRY if n.startswith("graph_"))
    assert names, "graph_ family missing from registry"
    for name in names:
        spec = REGISTRY[name]
        assert spec.oracle is not None
        ok, detail = compare_to_oracle(
            spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
        )
        assert ok, f"{name}: {detail}"


def test_pagerank_duplicate_edges_collapsed(spark):
    # Edges are a set: duplicates must not double contributions.
    a = _pr(spark, [(1, 2), (2, 1)], iterations=5)
    b = _pr(spark, [(1, 2), (1, 2), (2, 1)], iterations=5)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12


def test_pagerank_kernel_matches_distributed_loop(spark):
    """The r11 single-task Arrow kernel (default below
    spark.graft.pagerank_local_max_edges) must emit the same ranks as the
    distributed join+aggregate loop — including dangling-mass handling
    (node 7 has no out-edges) and hub asymmetry."""
    edges = [
        (1, 3), (2, 3), (4, 3), (3, 1), (1, 2), (5, 1), (3, 7), (6, 7),
    ]
    kernel = _pr(spark, edges, damping=0.85, iterations=10)
    prev = spark.conf.get("spark.graft.pagerank_local_max_edges", None)
    spark.conf.set("spark.graft.pagerank_local_max_edges", "0")
    try:
        dist = _pr(spark, edges, damping=0.85, iterations=10)
    finally:
        if prev is None:
            spark.conf.unset("spark.graft.pagerank_local_max_edges")
        else:
            spark.conf.set("spark.graft.pagerank_local_max_edges", prev)
    assert kernel.keys() == dist.keys()
    for k in dist:
        assert abs(kernel[k] - dist[k]) < 1e-12
    assert abs(sum(kernel.values()) - 1.0) < 1e-12


def test_pagerank_kernel_plan_is_single_arrow_pass(spark):
    """Below the edge ceiling the plan must be the one-task Arrow kernel:
    a MapInArrow over the checkpointed edges, no joins at all."""
    from datafusion_parallelism_spark.plans.shaping import physical_plan_str

    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], schema="u long, v long"
    )
    plan = physical_plan_str(pagerank(edges, iterations=4))
    assert "MapInArrow" in plan, plan
    assert "Join" not in plan, plan


def test_cc_kernel_matches_distributed_loop(spark):
    """The r11 single-task CC kernel must emit the same labels AND the
    same iteration count as the distributed loop (it runs the identical
    integer schedule)."""
    edges = [(1, 2), (2, 3), (10, 11), (12, 12), (5, 6), (6, 7), (7, 8)]
    df = spark.createDataFrame(edges, schema="u long, v long")
    k_stats, d_stats = {}, {}
    kernel = {
        r.node: r.cluster
        for r in connected_components(df, stats=k_stats).collect()
    }
    prev = spark.conf.get("spark.graft.cc_local_max_edges", None)
    spark.conf.set("spark.graft.cc_local_max_edges", "0")
    try:
        dist = {
            r.node: r.cluster
            for r in connected_components(df, stats=d_stats).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.graft.cc_local_max_edges")
        else:
            spark.conf.set("spark.graft.cc_local_max_edges", prev)
    assert kernel == dist
    assert k_stats["iterations"] == d_stats["iterations"]


def test_triangle_kernel_matches_distributed(spark):
    """r11 single-task triangle kernel ≡ distributed plan (exact integer
    counts) on a graph where degree order disagrees with id order."""
    from datafusion_parallelism_spark.operators.graph import triangle_counts

    raw = [(i, j) for i in range(10) for j in range(i + 1, 10) if (i * j) % 4 != 1]
    df = spark.createDataFrame(raw, schema="u long, v long")
    kern = {r.node: r.triangles for r in triangle_counts(df).collect()}
    prev = spark.conf.get("spark.graft.tri_local_max_edges", None)
    spark.conf.set("spark.graft.tri_local_max_edges", "0")
    try:
        dist = {r.node: r.triangles for r in triangle_counts(df).collect()}
    finally:
        if prev is None:
            spark.conf.unset("spark.graft.tri_local_max_edges")
        else:
            spark.conf.set("spark.graft.tri_local_max_edges", prev)
    assert kern == dist
