"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side and compares
row sets order-insensitively with columns sorted by name — the same contract
as CORRECTNESS_r{N}.json (BASELINE.md t2).  Used by tests/ and by ad-hoc
verification while developing; keeping it identical to the driver's compare
means a green test here predicts a green gate.

The canonicalize-before-compare approach mirrors the reference's
``collect_and_sort_results`` (src/lib.rs:756-792), which sorts result
batches on all columns before asserting equality.
"""

from __future__ import annotations

import math
import os
from typing import Iterable

import duckdb
from pyspark.sql import DataFrame, SparkSession

from .session import TABLE_NAMES


def table_glob(sf_dir: str, name: str) -> str | None:
    """read_parquet-able path for table ``name`` under ``sf_dir``, or None.

    ``<name>.parquet`` may be a single file (driver testdata) or a directory
    of part files (register_tables supports both; the round-8 scale replicas
    are multi-file) — DuckDB needs an explicit glob for the latter."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return f"{path}/*.parquet"
    if os.path.exists(path):
        return path
    return None


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register every driver table as a DuckDB view (driver does the same)."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        src = table_glob(sf_dir, name)
        if src is not None:
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{src}')"
            )
    return con


def _canon_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: tolerant to engine-level fp noise while
        # still catching real numeric bugs.
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return str(v) if v is not None else None


def _canon_rows(cols: list[str], rows: Iterable[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, x) for x in t))
    return out


def compare_to_oracle(
    spark: SparkSession,
    spark_df: DataFrame,
    oracle_sql: str,
    sf_dir: str,
) -> tuple[bool, str]:
    """Return (match, detail).  Columns are matched by sorted name; values
    canonicalized (floats to 12 sig digits) then compared as sorted row sets."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    con = duckdb_connection(sf_dir)
    res = con.execute(oracle_sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs = _canon_rows(s_cols, s_rows)
    cd = _canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return False, f"value mismatch; first diffs (spark, duckdb): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
