"""Regression-protect the scale-sweep replica generator (scripts/
scale_sweep.py): replicas must scale facts LINEARLY (self-contained
key-offset shards), keep dims fixed, and perturb document text per copy
so dedup candidate generation stays linear too."""

import importlib.util
import os

import duckdb
import pytest

SPEC = importlib.util.spec_from_file_location(
    "scale_sweep",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "scale_sweep.py"),
)
scale_sweep = importlib.util.module_from_spec(SPEC)
SPEC.loader.exec_module(scale_sweep)

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replica(tmp_path_factory):
    out_root = str(tmp_path_factory.mktemp("scale"))
    return scale_sweep.generate(3, src=SRC, out_root=out_root)


def tpath(root, t):
    """DuckDB-readable path for table ``t`` under ``root``: scaled replica
    tables are DIRECTORIES of part files since the multi-file layouts
    (whichever ``scale_sweep.LAYOUT`` names); dims and driver testdata stay
    single files."""
    p = f"{root}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def q1(sql):
    return duckdb.sql(sql).fetchone()[0]


def test_fact_tables_scale_linearly(replica):
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        n_src = q1(f"SELECT COUNT(*) FROM '{SRC}/{t}.parquet'")
        n_rep = q1(f"SELECT COUNT(*) FROM '{tpath(replica, t)}'")
        assert n_rep == 3 * n_src, t


def test_dims_stay_fixed(replica):
    for t in ("nation", "region"):
        assert q1(f"SELECT COUNT(*) FROM '{tpath(replica, t)}'") == q1(
            f"SELECT COUNT(*) FROM '{SRC}/{t}.parquet'"
        )


def test_joins_scale_linearly(replica):
    """Each copy is self-contained: the lineitem↔orders join result must be
    exactly 3x the source join, never cross-copy."""
    j_src = q1(
        f"SELECT COUNT(*) FROM '{SRC}/lineitem.parquet' l "
        f"JOIN '{SRC}/orders.parquet' o ON l.l_orderkey = o.o_orderkey"
    )
    j_rep = q1(
        f"SELECT COUNT(*) FROM '{tpath(replica, 'lineitem')}' l "
        f"JOIN '{tpath(replica, 'orders')}' o ON l.l_orderkey = o.o_orderkey"
    )
    assert j_rep == 3 * j_src


def test_keys_do_not_collide_across_copies(replica):
    assert q1(
        f"SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM '{tpath(replica, 'orders')}'"
    ) == 0


def test_document_text_perturbed_per_copy(replica):
    """Copies of the same source doc must NOT be identical text (identical
    clones would make LSH candidate pairs grow quadratically with the
    factor); copy 0 must be byte-identical to the source."""
    n_src = q1(f"SELECT COUNT(*) FROM '{SRC}/documents.parquet'")
    dup_groups = q1(
        f"SELECT COALESCE(SUM(c - 1), 0) FROM ("
        f"SELECT COUNT(*) AS c FROM '{tpath(replica, 'documents')}' "
        f"GROUP BY md5(text) HAVING COUNT(*) > 1)"
    )
    src_dups = q1(
        f"SELECT COALESCE(SUM(c - 1), 0) FROM ("
        f"SELECT COUNT(*) AS c FROM '{SRC}/documents.parquet' "
        f"GROUP BY md5(text) HAVING COUNT(*) > 1)"
    )
    # Replica dup surplus may only come from dups already in the source
    # (each source dup group of size g appears per-copy, perturbed the
    # same way within a copy: 3 groups of size g).
    assert dup_groups == 3 * src_dups, (dup_groups, src_dups)
    copy0 = q1(
        f"SELECT COUNT(*) FROM '{tpath(replica, 'documents')}' r "
        f"JOIN '{SRC}/documents.parquet' s USING (doc_id) WHERE r.text = s.text"
    )
    assert copy0 == n_src
