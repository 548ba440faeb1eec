"""In-memory table source — the reference's ``--from-memory`` mode.

Parity target: the reference pre-collects every parquet table into a
``StaticTable`` (in-memory StreamingTable with computed statistics) when
benchmarking memory-resident execution (``tpc/src/main.rs:386-412``,
``src/utils/static_table.rs:39-222``).

Spark-native mapping: ``df.cache()`` (MEMORY_AND_DISK columnar
InMemoryRelation).  Spark's cache manager substitutes the cached relation
into ANY subsequent plan whose canonicalized subtree matches — so both
``spark.sql`` over the registered views and DataFrame-API queries built
from :func:`..session.load` on the same paths automatically read from
memory, with no query changes.  Statistics: InMemoryRelation carries exact
row counts + sizes, which is what the reference's injected statistics
emulate (src/bin/main.rs:192-223).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import TABLE_NAMES, register_tables


def materialize_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TABLE_NAMES,
) -> dict[str, DataFrame]:
    """Cache every table under ``sf_dir`` in executor memory and register
    it as a temp view.  Returns the cached DataFrames.  Blocking: each
    table is fully materialized (count()) before returning, mirroring the
    reference's eager collect into StaticTable."""
    dfs = register_tables(spark, sf_dir, tables)
    for df in dfs.values():
        df.cache()
        df.count()
    return dfs


def release_tables(dfs: dict[str, DataFrame]) -> None:
    """Unpersist previously materialized tables."""
    for df in dfs.values():
        df.unpersist()
