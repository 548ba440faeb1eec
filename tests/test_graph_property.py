"""Property-based check: connected_components vs a union-find reference.

Random edge lists (self-loops, duplicate edges, both orientations, chain
fragments) — the distributed min-label + pointer-jumping implementation
(operators/graph.py) must produce exactly the min-node-id labeling that a
sequential union-find derives."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_parallelism_spark.operators.graph import connected_components

edges_st = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=20
)


def _uf(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)
    out = {}
    for members in comp.values():
        m = min(members)
        for node in members:
            out[node] = m
    return out


@given(edges=edges_st)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, schema="u long, v long")
    got = {r.node: r.cluster for r in connected_components(df).collect()}
    assert got == _uf(edges)


pr_edges_st = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=15,
)


def _pr_numpy(edges, damping, iterations):
    import numpy as np

    edges = sorted(set(edges))
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


@given(edges=pr_edges_st)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pagerank_matches_numpy_on_random_graphs(spark, edges):
    """Random digraphs (self-loops, duplicates, dangling nodes): the
    distributed power iteration must agree with a sequential NumPy one to
    float-summation-order tolerance, and ranks must stay a distribution."""
    from datafusion_parallelism_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, schema="u long, v long")
    got = {r.node: r["rank"] for r in pagerank(df, iterations=6).collect()}
    want = _pr_numpy(edges, 0.85, 6)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-10
    assert abs(sum(got.values()) - 1.0) < 1e-10


# ---------------------------------------------------------------------------
# triangle_counts vs brute-force enumeration
# ---------------------------------------------------------------------------

from itertools import combinations

from datafusion_parallelism_spark.operators.graph import triangle_counts


@given(edges_st)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_triangle_counts_match_bruteforce(spark, edges):
    # normalize: simple undirected graph, u < v, no self-loops/dups
    simple = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    if not simple:
        return
    eset = set(simple)
    nodes = sorted({n for e in simple for n in e})
    expected = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in eset and (a, c) in eset and (b, c) in eset:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    df = spark.createDataFrame(simple, "u long, v long")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# co_purchase_edges basket cap: a pathological star basket must be excluded
# before the quadratic pair expansion, and the count must be reported
# ---------------------------------------------------------------------------


def test_basket_cap_excludes_star_order(spark):
    """One 10,000-part order (50M pairs if expanded) plus normal baskets:
    the capped derivation must (a) finish fast because the star is dropped
    pre-join, (b) report exactly one capped order, (c) produce the same
    edges and triangle counts as the star-free input."""
    from datafusion_parallelism_spark.queries.graph import co_purchase_edges

    normal = [(o, p) for o in range(1, 6) for p in (1, 2, 3)]  # 5 co-triangles
    star = [(999, p) for p in range(10_000)]
    pu = spark.createDataFrame(normal + star, "o long, p long")
    capped = []
    edges = co_purchase_edges(pu, capped_counter=capped)
    got = sorted((r.u, r.v) for r in edges.collect())
    assert capped == [1]
    assert got == [(1, 2), (1, 3), (2, 3)]
    tri = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    assert tri == {1: 1, 2: 1, 3: 1}


def test_basket_cap_inert_below_threshold(spark):
    """Baskets at exactly the cap are kept — the guard only fires above."""
    from datafusion_parallelism_spark.queries.graph import (
        _TRI_MAX_BASKET,
        co_purchase_edges,
    )

    pu = spark.createDataFrame(
        [(1, p) for p in range(_TRI_MAX_BASKET)]
        + [(2, p) for p in range(_TRI_MAX_BASKET)],
        "o long, p long",
    )
    capped = []
    edges = co_purchase_edges(pu, capped_counter=capped)
    assert capped == [0]
    # every pair co-occurs in both orders -> all C(64,2) edges survive
    assert edges.count() == _TRI_MAX_BASKET * (_TRI_MAX_BASKET - 1) // 2
