"""dedup_winnow_hot_spans vs its DuckDB oracle on a PLANTED hot cluster.

The driver corpus contains no over-ceiling duplicate cluster, so the query's
CORRECTNESS row passes trivially with 0 rows (VERDICT r7 evidence gap): the
recall semantics rested on synthetic unit tests only.  This test closes the
gap end-to-end on real files — a derived fixture dir holds the sf0.01
documents PLUS one ~400-char article duplicated 520× (> WINNOW_FP_DF_CEILING
= 256, so every one of its fingerprints is dropped by dedup_winnow_spans'
stop-fingerprint cap), and the Spark query must hash-match the DuckDB oracle
on a NON-empty result: 519 anchor→member representative pairs.
"""

import os
import random
import string

import pytest

from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.queries.llm import (
    WINNOW_FP_DF_CEILING,
    WINNOW_K,
    WINNOW_W,
)
from datafusion_parallelism_spark.testing import compare_to_oracle

N_COPIES = 520  # > WINNOW_FP_DF_CEILING so the whole cluster is over-ceiling


@pytest.fixture(scope="module")
def hot_cluster_dir(tmp_path_factory):
    """sf0.01 documents + one article duplicated N_COPIES times, written as
    a documents.parquet the engine and the oracle both read."""
    assert N_COPIES > WINNOW_FP_DF_CEILING
    import duckdb

    out = tmp_path_factory.mktemp("hot_cluster_sf")
    # ~400 chars of seeded random words: long enough for dozens of
    # fingerprints (>= WINNOW_T shared), random enough to share none of its
    # k-grams with the real sf0.01 documents.
    rng = random.Random(8)
    article = " ".join(
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(3, 9)))
        for _ in range(70)
    )
    assert len(article) >= WINNOW_K + WINNOW_W - 1
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('/root/testdata/sf0.01/documents.parquet')
          UNION ALL
          SELECT 1000 + i AS doc_id, $1 AS text, 'en' AS lang,
                 'planted' AS source, length($1) AS n_chars
          FROM (SELECT unnest(range({N_COPIES})) AS i)
        ) TO '{out}/documents.parquet' (FORMAT parquet)
        """,
        [article],
    )
    return str(out)


def test_hot_spans_oracle_matches_on_planted_cluster(spark, hot_cluster_dir):
    q = REGISTRY["dedup_winnow_hot_spans"]
    df = q.fn(spark, hot_cluster_dir)
    rows = df.collect()
    # Every copy pairs with the cluster's min doc_id anchor (1000): 519
    # member pairs, nothing else (the real corpus plants no hot cluster).
    assert len(rows) == N_COPIES - 1
    assert {r["doc_a"] for r in rows} == {1000}
    assert {r["doc_b"] for r in rows} == set(range(1001, 1000 + N_COPIES))
    ok, detail = compare_to_oracle(spark, q.fn(spark, hot_cluster_dir), q.oracle, hot_cluster_dir)
    assert ok, detail


def test_capped_spans_exclude_planted_cluster(spark, hot_cluster_dir):
    """The complement: dedup_winnow_spans' df-ceiling cap must drop the
    planted cluster's pairs (they are what hot_spans exists to report), and
    the two outputs must stay disjoint by construction."""
    spans = REGISTRY["dedup_winnow_spans"].fn(spark, hot_cluster_dir)
    planted = spans.filter("doc_a >= 1000 OR doc_b >= 1000").count()
    assert planted == 0
