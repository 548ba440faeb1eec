"""Property-based join-semantics fuzzing vs DuckDB.

Goes beyond the reference's test strategy (SURVEY §5.5 notes it has no
randomized testing): hypothesis generates key/value tables with nulls,
duplicates, empty sides and disjoint domains, and every example is checked
against DuckDB for a randomly chosen join type from the reference's
supported set (probe_lookup_implementation.rs:32-43).  Null keys must never
match (null_equals_null=false) and duplicate keys must multiply rows —
exactly the edge cases the reference pins with hand-built batches
(src/lib.rs:149-246).
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_parallelism_spark.operators.joins import JOIN_TYPES, equi_join

_ids = st.lists(st.one_of(st.none(), st.integers(0, 5)), min_size=0, max_size=8)

_SQL = {
    "inner": "SELECT l.lid, l.lv, r.rid, r.rv FROM l JOIN r ON l.lid = r.rid",
    "left": "SELECT l.lid, l.lv, r.rid, r.rv FROM l LEFT JOIN r ON l.lid = r.rid",
    "right": "SELECT l.lid, l.lv, r.rid, r.rv FROM l RIGHT JOIN r ON l.lid = r.rid",
    "full": "SELECT l.lid, l.lv, r.rid, r.rv FROM l FULL JOIN r ON l.lid = r.rid",
    "left_semi": "SELECT lid, lv FROM l WHERE EXISTS (SELECT 1 FROM r WHERE r.rid = l.lid)",
    "left_anti": "SELECT lid, lv FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.rid = l.lid)",
    "right_semi": "SELECT rid, rv FROM r WHERE EXISTS (SELECT 1 FROM l WHERE l.lid = r.rid)",
    "right_anti": "SELECT rid, rv FROM r WHERE NOT EXISTS (SELECT 1 FROM l WHERE l.lid = r.rid)",
}


def _canon(rows):
    out = [tuple("∅" if v is None else int(v) for v in r) for r in rows]
    return sorted(out, key=repr)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    lids=_ids,
    rids=_ids,
    how=st.sampled_from(JOIN_TYPES),
)
def test_equi_join_matches_duckdb(spark, lids, rids, how):
    lpdf = pd.DataFrame({"lid": pd.array(lids, dtype="Int64"),
                         "lv": pd.array(range(len(lids)), dtype="Int64")})
    rpdf = pd.DataFrame({"rid": pd.array(rids, dtype="Int64"),
                         "rv": pd.array(range(len(rids)), dtype="Int64")})

    ldf = spark.createDataFrame(lpdf, schema="lid long, lv long")
    rdf = spark.createDataFrame(rpdf, schema="rid long, rv long")
    got = _canon(tuple(r) for r in equi_join(ldf, rdf, [("lid", "rid")], how=how).collect())

    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    want = _canon(con.execute(_SQL[how]).fetchall())
    assert got == want, f"{how}: spark={got} duckdb={want}"


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(lids=_ids, rids=_ids)
def test_residual_filter_matches_duckdb(spark, lids, rids):
    """Theta/residual condition (reference JoinFilter, src/lib.rs:672-677):
    equi key plus lv != rv residual, checked for inner and full."""
    lpdf = pd.DataFrame({"lid": pd.array(lids, dtype="Int64"),
                         "lv": pd.array([i % 3 for i in range(len(lids))], dtype="Int64")})
    rpdf = pd.DataFrame({"rid": pd.array(rids, dtype="Int64"),
                         "rv": pd.array([i % 3 for i in range(len(rids))], dtype="Int64")})
    ldf = spark.createDataFrame(lpdf, schema="lid long, lv long")
    rdf = spark.createDataFrame(rpdf, schema="rid long, rv long")

    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    for how, sql in [
        ("inner", "SELECT l.lid, l.lv, r.rid, r.rv FROM l JOIN r ON l.lid = r.rid AND l.lv != r.rv"),
        ("full", "SELECT l.lid, l.lv, r.rid, r.rv FROM l FULL JOIN r ON l.lid = r.rid AND l.lv != r.rv"),
    ]:
        got = _canon(
            tuple(r)
            for r in equi_join(
                ldf, rdf, [("lid", "rid")], how=how, residual=ldf["lv"] != rdf["rv"]
            ).collect()
        )
        want = _canon(con.execute(sql).fetchall())
        assert got == want, f"{how}: spark={got} duckdb={want}"


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(lids=_ids, rids=_ids, how=st.sampled_from(("inner", "left", "full", "left_semi")))
def test_multi_key_join_matches_duckdb(spark, lids, rids, how):
    """Composite-key joins (the reference's Vec<(expr, expr)> ``on`` list,
    parallel_hash_join.rs:24): both key columns must match, nulls in either
    key never match."""
    n_l, n_r = len(lids), len(rids)
    lpdf = pd.DataFrame({
        "lid": pd.array(lids, dtype="Int64"),
        "lid2": pd.array([i % 2 for i in range(n_l)], dtype="Int64"),
        "lv": pd.array(range(n_l), dtype="Int64"),
    })
    rpdf = pd.DataFrame({
        "rid": pd.array(rids, dtype="Int64"),
        "rid2": pd.array([i % 2 for i in range(n_r)], dtype="Int64"),
        "rv": pd.array(range(n_r), dtype="Int64"),
    })
    ldf = spark.createDataFrame(lpdf, schema="lid long, lid2 long, lv long")
    rdf = spark.createDataFrame(rpdf, schema="rid long, rid2 long, rv long")
    got = _canon(
        tuple(r)
        for r in equi_join(ldf, rdf, [("lid", "rid"), ("lid2", "rid2")], how=how).collect()
    )
    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    sql = {
        "inner": "SELECT l.*, r.* FROM l JOIN r ON l.lid = r.rid AND l.lid2 = r.rid2",
        "left": "SELECT l.*, r.* FROM l LEFT JOIN r ON l.lid = r.rid AND l.lid2 = r.rid2",
        "full": "SELECT l.*, r.* FROM l FULL JOIN r ON l.lid = r.rid AND l.lid2 = r.rid2",
        "left_semi": "SELECT l.* FROM l WHERE EXISTS "
        "(SELECT 1 FROM r WHERE r.rid = l.lid AND r.rid2 = l.lid2)",
    }[how]
    want = _canon(con.execute(sql).fetchall())
    assert got == want, f"{how}: spark={got} duckdb={want}"
