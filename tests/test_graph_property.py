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
