"""File sinks.

Parity target: the reference writes each benchmark query's first-iteration
result to ``q{n}.csv`` (``tpc/src/main.rs:372-377`` ``write_csv``) and a
JSON results file (``:272-278``).

Scale posture: sinks write DISTRIBUTED by default (one file per partition —
the only shape that works at 100 TB).  ``single_file=True`` coalesces to
one partition for small result sets (benchmark artifacts, < a few GB);
results of big queries should never set it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _prep(df: DataFrame, single_file: bool) -> DataFrame:
    return df.coalesce(1) if single_file else df


def write_csv(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    options: dict[str, str] | None = None,
) -> None:
    """CSV sink with header, overwrite semantics (tpc/src/main.rs:372-377).

    ``options`` passes through writer options (e.g. an explicit
    ``nullValue`` sentinel so NULL and '' stay distinguishable on re-read —
    CSV's default maps both to the empty field)."""
    w = _prep(df, single_file).write.mode("overwrite").option("header", "true")
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.csv(path)


def write_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSON-lines sink, overwrite semantics."""
    _prep(df, single_file).write.mode("overwrite").json(path)
